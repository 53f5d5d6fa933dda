"""Protocol-level Kafka fake: a Python streaming data source that speaks
the Kafka SOURCE CONTRACT (schema, subscribe, startingOffsets,
maxOffsetsPerTrigger, offset-range batching) over plain local files — so
the Kafka wiring in :func:`kafka_envelope_stream` gets behavioral
end-to-end coverage in environments with no broker (CI, this sandbox).

The "broker log" is one JSON-lines file per topic under ``log.dir``:
``<log.dir>/<topic>.jsonl``, line N = the message at offset N (append to
produce; the file is the partition). Single partition per topic — enough
to exercise subscribe lists, earliest/latest starting offsets, per-trigger
rate limiting, offset-range planning, and checkpoint/restart exactly-once,
which is precisely the surface the real connector options control
(reference ``moisturizer/consumer.py:72-81``: topics + bootstrap +
consumer-group offset management).

Rows carry the real Kafka source schema (key/value binary, topic,
partition, offset, timestamp, timestampType), so downstream envelope
decoding is byte-for-byte the production path.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


class _TopicSlice(InputPartition):
    def __init__(self, log_dir: str, topic: str, start: int, end: int):
        super().__init__((log_dir, topic, start, end))
        self.log_dir = log_dir
        self.topic = topic
        self.start = start
        self.end = end


def _log_len(log_dir: str, topic: str) -> int:
    path = os.path.join(log_dir, f"{topic}.jsonl")
    if not os.path.exists(path):
        return 0
    with open(path, "rb") as fh:
        return sum(1 for line in fh if line.strip())


class FakeKafkaStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        def opt(name, default=None):
            # DataSourceOptions lower-cases keys; accept either spelling
            return options.get(name.lower(), options.get(name, default))

        self.log_dir = opt("log.dir")
        if not self.log_dir:
            raise ValueError("kafka_fake requires option log.dir")
        subscribe = opt("subscribe", "")
        if not subscribe:
            raise ValueError("kafka_fake requires option subscribe")
        self.topics = [t.strip() for t in subscribe.split(",") if t.strip()]
        self.starting = opt("startingOffsets", "latest")
        raw_max = opt("maxOffsetsPerTrigger")
        self.max_per_trigger = int(raw_max) if raw_max else None
        # planner cursor for rate limiting: latestOffset() is called once
        # per micro-batch, so advancing at most max_per_trigger total
        # offsets past the previous plan reproduces the real connector's
        # per-trigger cap
        self._planned: dict[str, int] | None = None

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            return {t: 0 for t in self.topics}
        return {t: _log_len(self.log_dir, t) for t in self.topics}

    def latestOffset(self) -> dict:
        avail = {t: _log_len(self.log_dir, t) for t in self.topics}
        if self.max_per_trigger is None:
            self._planned = avail
            return avail
        base = self._planned if self._planned is not None else self.initialOffset()
        budget = self.max_per_trigger
        out = dict(base)
        for t in self.topics:  # round-robin-ish: fill in topic order
            take = min(budget, avail[t] - base.get(t, 0))
            if take > 0:
                out[t] = base.get(t, 0) + take
                budget -= take
        self._planned = out
        return out

    def partitions(self, start: dict, end: dict):
        out = []
        for t in self.topics:
            s, e = start.get(t, 0), end.get(t, 0)
            if e > s:
                out.append(_TopicSlice(self.log_dir, t, s, e))
        # Spark requires ≥1 partition per batch; an empty slice is fine
        if not out:
            out.append(_TopicSlice(self.log_dir, self.topics[0], 0, 0))
        return out

    def read(self, partition: _TopicSlice):
        path = os.path.join(partition.log_dir, f"{partition.topic}.jsonl")
        if not os.path.exists(path):
            return
        ts = _dt.datetime.now(_dt.timezone.utc)
        with open(path, "rb") as fh:
            for i, line in enumerate(x for x in fh if x.strip()):
                if partition.start <= i < partition.end:
                    yield (None, line.strip(), partition.topic, 0, i, ts, 0)

    def commit(self, end: dict) -> None:
        pass


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_fake"

    def schema(self) -> str:
        return KAFKA_SOURCE_SCHEMA

    def streamReader(self, schema):
        return FakeKafkaStreamReader(self.options)


def register(spark) -> None:
    """Register the fake source; after this, ``format('kafka_fake')``
    works anywhere ``format('kafka')`` would (same row schema)."""
    spark.dataSource.register(FakeKafkaDataSource)


def append_messages(log_dir: str, topic: str, envelopes) -> None:
    """Produce messages: append JSON envelopes to the topic log."""
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{topic}.jsonl"), "a") as fh:
        for e in envelopes:
            fh.write(json.dumps(e) + "\n")
