"""In-session maintained-index state for live (streaming) index
maintainers — the bookkeeping the round-9/10 live twins share:
per-epoch checkpointed index delta frames plus delete tombstones,
held as ONE ORDERED event list so a tombstone folds over only the
parts that PRECEDE it (a key deleted then re-inserted survives — the
routine CDF case), and FOLDED into a single re-checkpointed frame
whenever the event count exceeds ``compact_every`` (the round-8
log-checkpointing precedent applied to in-session state: without
compaction a long-lived stream accumulates O(epochs) unions plus one
anti-join per tombstone batch in every probe's plan; with it,
amortized O(index/K) per epoch and plan depth bounded by K for any
stream length).

The durable production shape persists the same state as lake tables
(append per epoch + anti-join rewrites, exactly-once via
commit_idempotent — warehouse_ivm_restartable proves that half);
this class is the bounded in-session analog the live twins use so
their pins can spend themselves on the maintenance algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LiveIndexState:
    """Ordered parts + tombstones with bounded plan depth.

    ``id_col`` is the index rows' key column; ``delete`` takes a
    one-column frame named ``gone_col``. Frames passed to ``append``
    /``delete`` should already be localCheckpointed (the caller owns
    epoch materialization so it can batch it with its other state).
    """

    def __init__(
        self,
        id_col: str,
        gone_col: str = "__gone",
        compact_every: int = 8,
    ) -> None:
        self.id_col = id_col
        self.gone_col = gone_col
        self.compact_every = compact_every
        self.events: list[tuple[str, DataFrame]] = []

    @property
    def index_parts(self) -> list[DataFrame]:
        return [f for kind, f in self.events if kind == "part"]

    @property
    def tombstones(self) -> list[DataFrame]:
        return [f for kind, f in self.events if kind == "gone"]

    def view(self) -> DataFrame | None:
        view: DataFrame | None = None
        for kind, frame in self.events:
            if kind == "part":
                view = frame if view is None else view.unionByName(frame)
            elif view is not None:
                view = view.join(
                    F.broadcast(frame),
                    F.col(self.id_col) == F.col(self.gone_col),
                    "left_anti",
                )
        return view

    def append(self, part: DataFrame) -> None:
        self.events.append(("part", part))
        self._maybe_compact()

    def delete(self, gone: DataFrame) -> None:
        if not self.index_parts:
            return  # nothing indexed yet, nothing to drop
        self.events.append(("gone", gone))
        self._maybe_compact()

    def _maybe_compact(self) -> None:
        if len(self.events) > self.compact_every:
            view = self.view()
            self.events = (
                [("part", view.localCheckpoint())]
                if view is not None
                else []
            )
