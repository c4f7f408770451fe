"""Streaming pcap source: tail a capture directory as a Structured
Streaming source (SURVEY.md §7.6 — live capture is absent in the
reference; its README lists it as roadmap).

`PcapStreamDataSource` implements SimpleDataSourceStreamReader: the
offset is the sorted list of fully-processed files; each micro-batch
dissects the files that appeared since the last offset with the same
native dissector the batch source uses. Rotating-capture directories
(tcpdump -G style) land files continuously; this reader turns them into
an unbounded packet DataFrame for watermarked window queries.
"""

from __future__ import annotations

import glob as globmod
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructField, StructType

from wireduck_spark.sources import native
from wireduck_spark.sources.glossary import fetch_selected_fields
from wireduck_spark.sources.typemap import map_ft_type


class PcapStreamDataSource(DataSource):
    """Registered name: `pcap_stream`. Options: path (glob), protocols."""

    @classmethod
    def name(cls) -> str:
        return "pcap_stream"

    def schema(self) -> StructType:
        protocols = [
            p.strip()
            for p in self.options.get("protocols", "").split(",")
            if p.strip()
        ]
        return StructType(
            [
                StructField(f.filter_name, map_ft_type(f.field_type), True)
                for f in fetch_selected_fields(protocols)
            ]
        )

    def simpleStreamReader(self, schema: StructType):
        return PcapStreamReader(schema, dict(self.options))


class PcapStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.pattern = options.get("path", "")

    def initialOffset(self) -> dict:
        return {"files": json.dumps([])}

    def _list_files(self) -> list[str]:
        return sorted(p for p in globmod.glob(self.pattern) if os.path.isfile(p))

    def read(self, start: dict):
        done = set(json.loads(start.get("files", "[]")))
        current = self._list_files()
        new_files = [p for p in current if p not in done]
        end = {"files": json.dumps(sorted(done | set(new_files)))}
        names = [f.name for f in self.schema_.fields]

        # Spark's SimpleStreamReader prefetch cache needs BOTH iterator
        # semantics (add_result_to_cache calls next(it)) AND copyability
        # (getCache copy.copy()s it for replay) — a generator fails copy,
        # a plain list fails next(). A list_iterator satisfies both.
        rows = [
            tuple(fields.get(n) for n in names)
            for path in new_files
            for fields in native.iter_packets(path)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        done = set(json.loads(start.get("files", "[]")))
        upto = set(json.loads(end.get("files", "[]")))
        names = [f.name for f in self.schema_.fields]
        for path in sorted(upto - done):
            if not os.path.isfile(path):
                continue
            for fields in native.iter_packets(path):
                yield tuple(fields.get(n) for n in names)

    def commit(self, end: dict) -> None:
        pass


def register_stream(spark) -> None:
    from wireduck_spark.sources.pcap import _ship_package

    _ship_package(spark)
    try:
        spark.dataSource.register(PcapStreamDataSource)
    except Exception:
        pass


def read_pcap_stream(spark, path_glob: str, protocols: str = ""):
    register_stream(spark)
    reader = spark.readStream.format("pcap_stream")
    if protocols:
        reader = reader.option("protocols", protocols)
    return reader.load(path_glob)


def traffic_per_window(packets, window: str = "10 seconds",
                       watermark: str = "30 seconds"):
    """Watermarked tumbling traffic stats over a packet stream: packets
    and bytes per (window, protocol path) — the continuous twin of
    `pcap_scan_default`'s batch aggregate, keyed on packet CAPTURE time
    (`frame.time_epoch`), not arrival time, so replayed/late capture
    files land in the right window until the watermark closes it.

    Scale: per-window per-protocol state only; the watermark bounds it.
    """
    from pyspark.sql import functions as F

    return (
        packets.withWatermark("`frame.time_epoch`", watermark)
        .groupBy(
            F.window(F.col("`frame.time_epoch`"), window).alias("w"),
            F.col("`frame.protocols`").alias("protocols"),
        )
        .agg(
            F.count("*").alias("n_packets"),
            F.sum("`frame.len`").cast("bigint").alias("total_bytes"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "protocols",
            "n_packets",
            "total_bytes",
        )
    )
