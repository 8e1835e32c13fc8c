"""Arbitrary stateful streaming on the Spark 4 transformWithState API
(SURVEY.md §2E stateful tier, second generation).

`applyInPandasWithState` (streaming/stateful.py) is the Spark 3.x-era
custom-state operator; Spark 4 ships `transformWithStateInPandas` with a
typed StatefulProcessor lifecycle (init/handleInputRows/close), named state
variables (value/list/map state), and timer support. Both express the same
job class — the custom Reducer-with-state MapReduce cannot express — so we
carry the per-user running profile on BOTH APIs, pytest-diffed against the
same batch aggregate, as the migration-path demonstration.

Scale shape: identical to the v1 operator — state is per-key (RocksDB-backed
on a real cluster), the stream shuffles once on user_id, and each micro-batch
touches only the keys it contains.

Environment note: transformWithState's Python driver worker speaks a
protobuf-based protocol; running it requires `google.protobuf` (absent in
this container — the pytest differential importorskips). The operator code
itself imports and constructs fine everywhere.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

if TYPE_CHECKING:  # pragma: no cover
    pass

PROFILE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)

PROFILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile (count, value sum, last-seen micros) as a
    single ValueState — the transformWithState twin of
    stateful.user_profiles."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", PROFILE_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        prev = self._state.get() if self._state.exists() else None
        n, s, last = prev if prev is not None else (0, 0.0, 0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            last = max(last, int(pdf["us"].max()))
        self._state.update((n, s, last))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_events": [n],
                "sum_value": [s],
                "last_us": [last],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile via transformWithStateInPandas.
    Input needs (user_id, value, us — epoch micros); emits the updated
    profile for every key seen in each micro-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
