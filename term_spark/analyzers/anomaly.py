"""Anomaly detection over a metric's history.

Parity: /root/reference/term-guard/src/analyzers/anomaly/detector.rs —
RelativeRateOfChange (:478), AbsoluteChange (:611), ZScore (:709) and
strategy variants (strategy.rs:155): asymmetric thresholds (:193),
minimum history (:211), confidence + expected range (strategy.rs:59-123).
Pure driver-side Python — no Spark involvement (SURVEY §2.10).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence

from ..core.constraint import Constraint as _Constraint
from ..core.constraint import metric_alias


@dataclass
class AnomalyResult:
    is_anomaly: bool
    value: float
    expected_low: Optional[float]
    expected_high: Optional[float]
    confidence: float
    detail: str = ""


class DetectionStrategy:
    """Base: override detect(history, newest)."""

    min_history = 1

    def check(self, series: Sequence[float]) -> AnomalyResult:
        if len(series) < self.min_history + 1:
            return AnomalyResult(False, series[-1] if series else float("nan"),
                                 None, None, 0.0, "insufficient history")
        return self.detect(list(series[:-1]), float(series[-1]))

    def detect(self, history: List[float], newest: float) -> AnomalyResult:
        raise NotImplementedError


class RelativeRateOfChange(DetectionStrategy):
    """newest/previous must stay within [max_decrease, max_increase]."""

    def __init__(self, max_increase: float = 2.0, max_decrease: float = 0.5,
                 min_history: int = 1):
        self.max_increase = max_increase
        self.max_decrease = max_decrease
        self.min_history = min_history

    def detect(self, history, newest):
        prev = history[-1]
        if prev == 0:
            rate = math.inf if newest != 0 else 1.0
        else:
            rate = newest / prev
        low, high = prev * self.max_decrease, prev * self.max_increase
        anomaly = not (self.max_decrease <= rate <= self.max_increase)
        conf = min(1.0, abs(math.log(rate)) / math.log(max(self.max_increase, 2.0))) \
            if rate > 0 and not math.isinf(rate) else 1.0
        return AnomalyResult(anomaly, newest, low, high,
                             conf if anomaly else 1.0 - conf,
                             f"rate of change {rate:.4f}")


class AbsoluteChange(DetectionStrategy):
    def __init__(self, max_increase: float, max_decrease: Optional[float] = None,
                 min_history: int = 1):
        self.max_increase = max_increase
        self.max_decrease = max_decrease if max_decrease is not None else max_increase
        self.min_history = min_history

    def detect(self, history, newest):
        prev = history[-1]
        delta = newest - prev
        low, high = prev - self.max_decrease, prev + self.max_increase
        anomaly = not (low <= newest <= high)
        span = self.max_increase + self.max_decrease
        conf = min(1.0, abs(delta) / span) if span > 0 else 1.0
        return AnomalyResult(anomaly, newest, low, high,
                             conf if anomaly else 1.0 - conf,
                             f"absolute change {delta:+.4f}")


class ZScore(DetectionStrategy):
    def __init__(self, threshold: float = 3.0, min_history: int = 3):
        self.threshold = threshold
        self.min_history = min_history

    def detect(self, history, newest):
        n = len(history)
        mean = sum(history) / n
        var = sum((x - mean) ** 2 for x in history) / (n - 1) if n > 1 else 0.0
        std = math.sqrt(var)
        if std == 0:
            anomaly = newest != mean
            return AnomalyResult(anomaly, newest, mean, mean,
                                 1.0 if anomaly else 0.0, "zero variance history")
        z = (newest - mean) / std
        low, high = mean - self.threshold * std, mean + self.threshold * std
        anomaly = abs(z) > self.threshold
        conf = min(1.0, abs(z) / (2 * self.threshold))
        return AnomalyResult(anomaly, newest, low, high,
                             conf if anomaly else 1.0 - conf, f"z-score {z:+.3f}")


class EwmaControl(DetectionStrategy):
    """EWMA control chart (Roberts 1959, the classic drift-sensitive
    companion to Shewhart/z-score charts): track an exponentially
    weighted mean and flag the newest point when it leaves
    mean_ewma ± L·sigma·sqrt(lambda/(2−lambda)) — the steady-state
    EWMA control limits.  Where z-score needs one big jump, EWMA
    accumulates evidence and catches SLOW drift (a metric creeping a
    fraction of a sigma per run) long before any single point is
    extreme.

    ``lam`` is the EWMA weight (0.2 is the textbook default: ~5-run
    memory); ``L`` the control-limit width in sigmas.  The mean/sigma
    baseline comes from the OLDEST half of the history (at least
    ``min_history`` points) — the in-control reference period of a
    real control chart.  Estimating them over the full history would
    let a drift contaminate its own control limits and go unseen
    (exactly the masking this chart exists to beat).
    """

    def __init__(self, lam: float = 0.2, L: float = 2.7,
                 min_history: int = 5):
        if not 0.0 < lam <= 1.0:
            raise ValueError(f"lam must be in (0,1], got {lam}")
        if L <= 0:
            raise ValueError(f"L must be > 0, got {L}")
        self.lam = float(lam)
        self.L = float(L)
        self.min_history = min_history

    def detect(self, history, newest):
        base = history[:max(self.min_history, len(history) // 2)]
        n = len(base)
        mean = sum(base) / n
        var = sum((x - mean) ** 2 for x in base) / (n - 1) if n > 1 else 0.0
        std = math.sqrt(var)
        # EWMA through the FULL history, then absorb the newest point
        z = history[0]
        for x in history[1:]:
            z = self.lam * x + (1 - self.lam) * z
        z_new = self.lam * newest + (1 - self.lam) * z
        half = (self.L * std
                * math.sqrt(self.lam / (2 - self.lam)))
        low, high = mean - half, mean + half
        if std == 0:
            anomaly = newest != mean
            return AnomalyResult(anomaly, newest, mean, mean,
                                 1.0 if anomaly else 0.0,
                                 "zero variance history")
        anomaly = not (low <= z_new <= high)
        dist = abs(z_new - mean) / half if half > 0 else 0.0
        conf = min(1.0, dist / 2)
        return AnomalyResult(anomaly, newest, low, high,
                             conf if anomaly else 1.0 - conf,
                             f"ewma {z_new:.4f} vs mean {mean:.4f}")


class InterquartileRange(DetectionStrategy):
    """Tukey-fence detector: the newest value must lie within
    [Q1 − k·IQR, Q3 + k·IQR] of the history (k = 1.5 classic, 3.0
    "far out").  The robust member of the family — a few historical
    spikes inflate ZScore's sigma and mask real anomalies, but they
    barely move the quartiles (same masking argument as the
    median/MAD row gate, applied to the metric series).
    """

    def __init__(self, k: float = 1.5, min_history: int = 4):
        if k <= 0:
            raise ValueError(f"k must be > 0, got {k}")
        self.k = float(k)
        self.min_history = min_history

    @staticmethod
    def _quantile(sorted_xs, q):
        # linear interpolation (type-7, numpy default)
        pos = (len(sorted_xs) - 1) * q
        lo = int(math.floor(pos))
        hi = min(lo + 1, len(sorted_xs) - 1)
        frac = pos - lo
        return sorted_xs[lo] * (1 - frac) + sorted_xs[hi] * frac

    def detect(self, history, newest):
        xs = sorted(history)
        q1 = self._quantile(xs, 0.25)
        q3 = self._quantile(xs, 0.75)
        iqr = q3 - q1
        low, high = q1 - self.k * iqr, q3 + self.k * iqr
        if iqr == 0:
            anomaly = not (low <= newest <= high)  # degenerate: == band
            return AnomalyResult(anomaly, newest, low, high,
                                 1.0 if anomaly else 0.0,
                                 "zero IQR history")
        anomaly = not (low <= newest <= high)
        overshoot = max(low - newest, newest - high, 0.0) / iqr
        conf = min(1.0, overshoot / self.k)
        return AnomalyResult(anomaly, newest, low, high,
                             conf if anomaly else 1.0 - conf,
                             f"IQR fence [{low:.4f}, {high:.4f}]")


class AnomalyDetector:
    """Runner+builder (detector.rs:840,936): strategy over a repository
    metric series."""

    def __init__(self, strategy: DetectionStrategy):
        self.strategy = strategy

    def detect_on(self, repository, metric: str, tags=None) -> AnomalyResult:
        series = repository.series(metric, tags=tags)
        if not series:
            return AnomalyResult(False, float("nan"), None, None, 0.0, "no history")
        return self.strategy.check(series)

    def detect_series(self, series: Sequence[float]) -> AnomalyResult:
        return self.strategy.check(series)


class SeasonalComparison(DetectionStrategy):
    """Beyond-parity round-5 addition: compare the newest value against
    the value exactly ``period`` observations back — the seasonal
    baseline (same hour yesterday with hourly metrics and period=24,
    same weekday last week with daily metrics and period=7).

    The plain trend detectors fire every peak of a legitimate daily or
    weekly cycle; the seasonal lag cancels the cycle, so the gate is
    the ratio to the SAME phase of the previous period, with the usual
    asymmetric bounds (``max_increase``/``max_decrease``, the
    RelativeRateOfChange convention). Driver-side pure Python over
    repository history like every other strategy.
    """

    def __init__(self, period: int, max_increase: float = 2.0,
                 max_decrease: float = 0.5):
        if period < 1:
            raise ValueError(f"period must be >= 1, got {period}")
        if not (0 < max_decrease <= max_increase):
            raise ValueError(
                f"need 0 < max_decrease <= max_increase, got "
                f"[{max_decrease}, {max_increase}]")
        self.period = int(period)
        self.max_increase = float(max_increase)
        self.max_decrease = float(max_decrease)
        self.min_history = int(period)

    def detect(self, history, newest):
        baseline = history[-self.period]
        low, high = baseline * self.max_decrease, baseline * self.max_increase
        if baseline == 0:
            anomaly = newest != 0
            return AnomalyResult(anomaly, newest, 0.0, 0.0,
                                 1.0 if anomaly else 0.0,
                                 f"zero seasonal baseline (lag {self.period})")
        rate = newest / baseline
        anomaly = not (self.max_decrease <= rate <= self.max_increase)
        conf = (min(1.0, abs(math.log(rate)) /
                    math.log(max(self.max_increase, 2.0)))
                if rate > 0 else 1.0)
        return AnomalyResult(anomaly, newest, low, high,
                             conf if anomaly else 1.0 - conf,
                             f"seasonal rate {rate:.4f} vs lag {self.period}")


class AnomalyConstraint(_Constraint):
    """``has_no_anomaly``: a scalar metric of the CURRENT run must not
    be anomalous against its own repository history under a
    DetectionStrategy — the check-level form of anomaly detection
    (validate-then-alert in one suite run, instead of a separate
    monitoring pass).

    Rides the shared fused aggregation (the metric is one scalar
    expression — no extra scan); history comes from the repository at
    evaluation time, so pair it with ``ValidationSuite.run_and_store``
    to append each run's metrics and the gate tightens as history
    accumulates. With no history yet the constraint passes (a brand
    new metric cannot be anomalous against nothing) — the detector's
    own ``min_history`` keeps early runs from alerting.
    """

    name = "no_anomaly"

    def __init__(self, metric_name: str, metric_expr, detector,
                 repository, tags=None):
        self.metric_name = str(metric_name)
        self.metric_expr = metric_expr
        self.detector = detector
        self.repository = repository
        self.tags = tags
        # md5-based deterministic alias (ADVICE r5: Python hash() is
        # PYTHONHASHSEED-salted across processes and can collide mod
        # 1e8, silently making one anomaly constraint read another's
        # metric) — same scheme as every other constraint
        self._alias = metric_alias("anom", self.metric_name)

    def scalar_metrics(self, df):
        return {self._alias: self.metric_expr}

    def result_from_metrics(self, metrics):
        from ..core.result import ConstraintResult
        raw = metrics[self._alias]
        if raw is None:
            return ConstraintResult.skipped(
                f"no_anomaly({self.metric_name}): metric is NULL")
        value = float(raw)
        history = self.repository.series(self.metric_name, tags=self.tags)
        result = self.detector.check(list(history) + [value])
        if not result.is_anomaly:
            return ConstraintResult.success(value)
        return ConstraintResult.failure(
            value,
            f"no_anomaly({self.metric_name}): {value} is anomalous vs "
            f"{len(history)} historical points "
            f"(expected [{result.expected_low}, {result.expected_high}]; "
            f"{result.detail})")
