"""Streaming observability (SURVEY.md §2.9 T5, T11).

The reference's watchdog polls the newest candle per symbol every
120 s and alerts when the freshest ``stop`` lags now() by more than
2 minutes (data_quality_check.py:111-141).  Structured Streaming
exposes the same signals push-style: a ``StreamingQueryListener``
receives per-batch progress (rows/s, batch duration, watermark), and
the batch-side ``freshness`` operator (operators/queries.py) runs
against the sink table for the per-symbol lag report.

``CandleStreamMonitor`` collects the metrics the reference logs:
input rate, processed rate, batch id, and flags stalls (no progress
for longer than the freshness SLO).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

try:  # pragma: no cover - import shape differs across pyspark versions
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    from pyspark.sql.streaming.listener import StreamingQueryListener


@dataclass
class BatchStats:
    batch_id: int
    timestamp: str
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float


@dataclass
class CandleStreamMonitor(StreamingQueryListener):
    """Collects per-batch progress; ``is_stale`` mirrors the 2-minute
    freshness SLO (data_quality_check.py:130)."""

    slo_seconds: int = 120
    batches: list[BatchStats] = field(default_factory=list)
    started: list[str] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)
    _last_progress_at: float = field(default_factory=time.monotonic)

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._last_progress_at = time.monotonic()
        self.batches.append(
            BatchStats(
                batch_id=p.batchId,
                timestamp=p.timestamp,
                num_input_rows=p.numInputRows,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                process_rows_per_second=p.processedRowsPerSecond or 0.0,
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    # -- report surface -------------------------------------------------
    @property
    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    @property
    def is_stale(self) -> bool:
        """No batch progress within the SLO window."""
        return (time.monotonic() - self._last_progress_at) > self.slo_seconds

    def summary(self) -> dict:
        return {
            "n_batches": len(self.batches),
            "total_rows": self.total_rows,
            "max_process_rows_per_second": max(
                (b.process_rows_per_second for b in self.batches), default=0.0
            ),
            "stale": self.is_stale,
        }
