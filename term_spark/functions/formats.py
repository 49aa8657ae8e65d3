"""Format-validation regex patterns.

Parity: /root/reference/term-guard/src/constraints/format.rs:188-296 —
the FormatType enum and its patterns, ported to Java-regex-compatible
form (Spark uses Java regex; these patterns avoid lookaround so they
behave identically in Java, RE2-style engines, and DuckDB).
"""

from __future__ import annotations

from typing import Optional

EMAIL = r"^[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$"

URL = r"^https?://[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}(?::\d+)?(?:/[^\s]*)?$"
URL_ALLOW_LOCALHOST = r"^https?://(?:localhost|(?:[a-zA-Z0-9.-]+\.?[a-zA-Z]{2,}|(?:\d{1,3}\.){3}\d{1,3}))(?::\d+)?(?:/[^\s]*)?$"

CREDIT_CARD = (
    r"^(?:4[0-9]{12}(?:[0-9]{3})?|5[1-5][0-9]{14}|3[47][0-9]{13}|3[0-9]{13}"
    r"|6(?:011|5[0-9]{2})[0-9]{12})$|^(?:\d{4}[-\s]?){3}\d{4}$"
)

PHONE = {
    "US": r"^(\+?1[-.\s]?)?\(?([0-9]{3})\)?[-.\s]?([0-9]{3})[-.\s]?([0-9]{4})$",
    "CA": r"^(\+?1[-.\s]?)?\(?([0-9]{3})\)?[-.\s]?([0-9]{3})[-.\s]?([0-9]{4})$",
    "UK": r"^(\+44\s?)?(?:\(?0\d{4}\)?\s?\d{6}|\(?0\d{3}\)?\s?\d{7}|\(?0\d{2}\)?\s?\d{8})$",
    "DE": r"^(\+49\s?)?(?:\(?0\d{2,5}\)?\s?\d{4,12})$",
    "FR": r"^(\+33\s?)?(?:\(?0\d{1}\)?\s?\d{8})$",
    # E.164 international format (default)
    None: r"^[\+]?[1-9][\d]{0,15}$",
}

POSTAL_CODE = {
    "US": r"^\d{5}(-\d{4})?$",
    "CA": r"^[A-Za-z]\d[A-Za-z][ -]?\d[A-Za-z]\d$",
    "UK": r"^[A-Z]{1,2}\d[A-Z\d]?\s?\d[A-Z]{2}$",
    "DE": r"^\d{5}$",
    "FR": r"^\d{5}$",
    "JP": r"^\d{3}-\d{4}$",
    "AU": r"^\d{4}$",
    None: r"^[A-Za-z0-9\s-]{3,10}$",
}

UUID = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[1-5][0-9a-fA-F]{3}-[89abAB][0-9a-fA-F]{3}-[0-9a-fA-F]{12}$"

IPV4 = r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"

IPV6 = (
    r"^([0-9a-fA-F]{0,4}:){1,7}([0-9a-fA-F]{0,4})?$"
    r"|^::$|^::1$"
    r"|^([0-9a-fA-F]{1,4}:)*::([0-9a-fA-F]{1,4}:)*[0-9a-fA-F]{1,4}$"
)

JSON = r"^\s*[\{\[].*[\}\]]\s*$"

ISO8601_DATETIME = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})$"

SSN = (
    r"^(00[1-9]|0[1-9][0-9]|[1-5][0-9]{2}|6[0-5][0-9]|66[0-5]|667|66[89]|6[7-9][0-9]"
    r"|[7-8][0-9]{2})-?(0[1-9]|[1-9][0-9])-?(000[1-9]|00[1-9][0-9]|0[1-9][0-9]{2}|[1-9][0-9]{3})$"
)


def phone_pattern(country: Optional[str] = None) -> str:
    return PHONE.get(country, PHONE[None])


def postal_code_pattern(country: Optional[str] = None) -> str:
    return POSTAL_CODE.get(country, POSTAL_CODE[None])


FORMAT_PATTERNS = {
    "email": EMAIL,
    "url": URL,
    "credit_card": CREDIT_CARD,
    "uuid": UUID,
    "ipv4": IPV4,
    "ipv6": IPV6,
    "json": JSON,
    "iso8601_datetime": ISO8601_DATETIME,
    "ssn": SSN,
}
