"""Symmetric one-to-many join on Spark 4's transformWithStateInPandas.

Functionally identical to streaming/join.py's applyInPandasWithState
operator (same tagged-union input, same emission contract — upsert/probe on
car arrive, delete on leave with no retraction, fan-out on zone update:
DemoApp.scala:187-298), but expressed on the typed state API:

- ``ValueState[pollution]`` — the reference's zone-events-store
  (DemoApp.scala:251-254), one value per zone.
- ``MapState[car_id → fuel]`` — the reference's composite-key car store
  (DemoApp.scala:171,182-185).  This is the exact state shape SURVEY.md
  §4.3 maps the RocksDB prefix-range-scan store onto: Spark keyed state is
  hash-addressed, so "all cars in zone Z" is the one map for key Z, and
  the MapState API gives per-entry put/remove — a car arriving or leaving
  touches ONE RocksDB entry, not a rewrite of the whole zone's state row
  (the applyInPandasWithState version rewrites its array-typed state value
  per zone per batch; fine up to very large fan-in, but per-entry MapState
  is the asymptotically tighter shape for extreme cars-per-zone).

Prefer this operator on Spark ≥ 4.0 with protobuf available (the TWS
state-server wire protocol is protobuf-based); keep the
applyInPandasWithState one as the portable fallback.  ``compat.
ensure_protobuf`` discovers a standalone protobuf runtime where none is
pip-installed, so the gate below only trips on genuinely protobuf-less
hosts; the processor logic is additionally unit-tested with stub state
handles, and the end-to-end equivalence test is the behavioral
compatibility gate for discovered runtimes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from kafka_streams_one_to_many_join_spark.compat import ensure_protobuf
from kafka_streams_one_to_many_join_spark.streaming.join import JOINED_STREAM

try:  # Spark >= 4.0 AND protobuf resolvable (the TWS state-server protocol
    # is protobuf-based; without it the driver worker crashes at init)
    if not ensure_protobuf():
        raise ImportError("google.protobuf not resolvable")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - Spark 3.x or no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = Any  # type: ignore[assignment,misc]
    HAS_TWS = False


class SymmetricJoinProcessor(StatefulProcessor):
    """Per-zone state: ValueState(pollution) + MapState(car_id → fuel).

    ``ttl_ms`` (default None = reference keep-forever semantics,
    DemoApp.scala:182-185,251-254) enables the typed-state API's NATIVE
    state TTL: both stores expire entries untouched for ``ttl_ms`` of
    processing time — the opt-in bound on keyed state for never-revisited
    zones that a 100 TB deployment needs.  An expired zone behaves as a
    cold start (car arrivals probe nothing until the next zone event).
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._zone = handle.getValueState(
            "zone", "pollution_level double", ttlDurationMs=self._ttl_ms
        )
        self._cars = handle.getMapState(
            "cars", "car_id int", "fuel_level double", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (zone_id,) = key
        pollution = self._zone.get()[0] if self._zone.exists() else None
        out: list[dict] = []
        batch = pd.concat(list(rows), ignore_index=True)
        for row in batch.sort_values(["seq", "emit_rank"]).itertuples(index=False):
            if row.kind == "car":
                car_id = int(row.car_id)
                if bool(row.is_arriving):
                    # upsert + probe (DemoApp.scala:210-222)
                    self._cars.updateValue((car_id,), (float(row.fuel_level),))
                    if pollution is not None:
                        out.append(dict(
                            car_id=car_id, zone_id=zone_id,
                            fuel_level=float(row.fuel_level),
                            pollution_level=float(pollution),
                        ))
                else:
                    # delete, no retraction (DemoApp.scala:224-230)
                    if self._cars.containsKey((car_id,)):
                        self._cars.removeKey((car_id,))
            else:
                # zone upsert + fan-out over the map (DemoApp.scala:279-290)
                pollution = float(row.pollution_level)
                self._zone.update((pollution,))
                resident = sorted(
                    (int(k[0]), float(v[0])) for k, v in self._cars.iterator()
                )
                for car_id, fuel in resident:
                    out.append(dict(
                        car_id=car_id, zone_id=zone_id,
                        fuel_level=fuel, pollution_level=pollution,
                    ))
        if pollution is not None:
            self._zone.update((pollution,))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def symmetric_one_to_many_join_tws(
    tagged: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Streaming O6+O7 on the Spark 4 typed-state API (see module doc).

    Input: the tagged union produced by tag_car_moves/tag_zone_events.
    ``ttl_ms``: opt-in native state TTL (requires processing-time mode);
    default None keeps the reference's keep-forever semantics.
    """
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 with protobuf "
            "installed; use streaming.symmetric_one_to_many_join instead"
        )
    return tagged.groupBy("zone_id").transformWithStateInPandas(
        statefulProcessor=SymmetricJoinProcessor(ttl_ms),
        outputStructType=JOINED_STREAM,
        outputMode="append",
        # state TTL is only legal in processing-time mode
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
