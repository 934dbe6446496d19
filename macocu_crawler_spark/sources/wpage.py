"""wpage + ARC file formats — the reference's raw-response archives.

wpage record (crawl.py:575-578 write, process.py:530-537 read):
    UTF-8 header line: "wpage_id url scheme host path ip connect_time
    header_len body_len\\n", followed by header_len raw HTTP-header bytes
    and body_len raw body bytes.  Files may be gzipped.

ARC record (process.py:558-569):
    "url ip time text/html header_len body_len wpage_id\\n" + header bytes
    + body bytes; gzip-appended, 100 GB rotation.

Readers use Spark's binaryFile source + mapInPandas: one task per archive
file (archives are the unit of parallelism, as in any WARC pipeline), rows
come out in the input_hint pages shape, so `reprocess` is literally
``read_wpage(...)`` → ``extract_documents`` (reference reprocess.py:49-286).
Writers produce one archive per partition (the Iceberg pages table is the
primary store — ARC/wpage export is an interchange path).
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _task_part_id() -> tuple[str, str]:
    """Collision-free archive filename components: (final, attempt).

    Spark reuses Python worker processes across partitions, so (pid, count)
    collides whenever one worker handles two equal-sized partitions — the
    FINAL name is the task's stageId-partitionId (unique within a write
    job).  But stageId-partitionId is identical across task ATTEMPTS: a
    speculative or zombie attempt racing its retry on the same path with a
    non-atomic open(path, 'wb') could tear the archive, so writes go to an
    ATTEMPT-unique temp name (taskAttemptId suffix) and os.rename onto the
    final name — rename is atomic on POSIX, the last completed attempt
    wins whole.  Outside a task context (plain-Python tests): uuid4."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx is not None:
        final = f"{ctx.stageId()}-{ctx.partitionId():05d}"
        return final, f"{final}.attempt-{ctx.taskAttemptId()}"
    import uuid

    u = uuid.uuid4().hex
    return u, f"{u}.tmp"


def _atomic_write(out_dir: str, suffix: str, data: bytes) -> str:
    """Write data to its attempt-unique temp path, then atomically rename
    to the attempt-stable final path.  Returns the final path."""
    import glob

    final, attempt = _task_part_id()
    tmp_path = os.path.join(out_dir, f".part-{attempt}{suffix}")
    path = os.path.join(out_dir, f"part-{final}{suffix}")
    with open(tmp_path, "wb") as f:
        f.write(data)
    os.rename(tmp_path, path)
    # a task attempt that died between write and rename leaves its hidden
    # temp behind; the surviving attempt sweeps its siblings so the litter
    # stays bounded over long crawls (ADVICE r4).  Age-gated: a LIVE
    # speculative attempt's temp (written seconds ago) must not be swept —
    # unlinking it between its write and rename would fail that attempt
    # and count toward spark.task.maxFailures; only temps old enough that
    # their attempt is certainly dead are removed
    import time

    cutoff = time.time() - 600
    for stale in glob.glob(os.path.join(out_dir, f".part-{final}.attempt-*{suffix}")):
        try:
            if os.path.getmtime(stale) < cutoff:
                os.remove(stale)
        except OSError:
            pass
    return path


PAGES_OUT_SCHEMA = T.StructType(
    [
        T.StructField("wpage_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("http_header", T.BinaryType()),
        T.StructField("ip", T.StringType()),
    ]
)


def _parse_ts(connect_time: str) -> dt.datetime:
    return dt.datetime.strptime(connect_time, "%Y%m%d%H%M%S")


def parse_wpage_bytes(blob: bytes) -> list[tuple]:
    """Parse one wpage file's bytes into page tuples (process.py:528-537)."""
    rows = []
    stream = io.BytesIO(blob)
    while True:
        header_line = stream.readline()
        if not header_line:
            break
        wpage_id, url, _scheme, _host, _path, ip, connect_time, header_len, body_len = (
            header_line.decode("utf-8").split(" ")
        )
        header_len, body_len = int(header_len), int(body_len)
        http_header = stream.read(header_len)
        body = stream.read(body_len)
        rows.append(
            (int(wpage_id), url, _parse_ts(connect_time), body, http_header, ip)
        )
    return rows


def parse_arc_bytes(blob: bytes) -> list[tuple]:
    """Parse one (decompressed) ARC file's bytes (process.py:558-565)."""
    rows = []
    stream = io.BytesIO(blob)
    while True:
        header_line = stream.readline()
        if not header_line:
            break
        url, ip, connect_time, _mime, header_len, body_len, wpage_id = (
            header_line.decode("utf-8").split(" ")
        )
        header_len, body_len = int(header_len), int(body_len)
        http_header = stream.read(header_len)
        body = stream.read(body_len)
        rows.append(
            (int(wpage_id), url, _parse_ts(connect_time), body, http_header, ip)
        )
    return rows


def _reader(parse, paths_are_gzip: bool):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PAGES_OUT_SCHEMA.fields]
        for batch in batches:
            rows = []
            for r in batch.itertuples(index=False):
                blob = bytes(r.content)
                if paths_are_gzip or r.path.endswith(".gz"):
                    blob = gzip.decompress(blob)
                rows.extend(parse(blob))
            yield pd.DataFrame(rows, columns=cols)

    return run


def read_wpage(spark: SparkSession, path_glob: str) -> DataFrame:
    """wpage files → pages DataFrame (S4)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(_reader(parse_wpage_bytes, False), PAGES_OUT_SCHEMA)


def read_arc(spark: SparkSession, path_glob: str) -> DataFrame:
    """ARC archives → pages DataFrame (reprocess input, S14)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(_reader(parse_arc_bytes, False), PAGES_OUT_SCHEMA)


def write_arc(pages: DataFrame, out_dir: str) -> int:
    """pages DataFrame → one gzip ARC file per partition (S5).

    Returns the number of records written.  Record framing matches
    process.py:558-565 byte-for-byte so the reference's tooling can read
    the output.
    """
    os.makedirs(out_dir, exist_ok=True)
    prepared = pages.select(
        "wpage_id", "url", "ip",
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("connect_time"),
        "http_header", "html",
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        count = 0
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=9) as gz:
            for batch in batches:
                for r in batch.itertuples(index=False):
                    header = bytes(r.http_header) if r.http_header is not None else b""
                    body = bytes(r.html) if r.html is not None else b""
                    arc_header = (
                        f"{r.url} {r.ip} {r.connect_time} text/html "
                        f"{len(header)} {len(body)} {r.wpage_id}\n"
                    ).encode("utf-8")
                    gz.write(arc_header)
                    gz.write(header)
                    gz.write(body)
                    count += 1
        if count:
            _atomic_write(out_dir, ".arc.gz", buf.getvalue())
        yield pd.DataFrame({"n": [count]})

    counts = prepared.mapInPandas(write_partition, "n long")
    return int(counts.agg(F.sum("n")).first()[0] or 0)


# ---------------------------------------------------------------------------
# WARC/1.0 export + reader (the interchange format of every public web
# corpus; SURVEY §1.1 "optional export to WARC")
# ---------------------------------------------------------------------------

_WARC_SEP = b"\r\n\r\n"


def _warc_record(wpage_id, url, ip, iso_ts, header: bytes, body: bytes) -> bytes:
    import uuid

    rec_id = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{iso_ts}|{wpage_id}")
    payload = header + body
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Date: {iso_ts}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-IP-Address: {ip}\r\n"
        f"WARC-X-WPage-ID: {wpage_id}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + _WARC_SEP


def write_warc(pages: DataFrame, out_dir: str) -> int:
    """pages DataFrame → one gzip WARC/1.0 file per partition.

    Record IDs are deterministic (uuid5 of url|date|wpage_id — no RNG, so
    re-runs produce byte-identical archives).  Returns records written."""
    os.makedirs(out_dir, exist_ok=True)
    prepared = pages.select(
        "wpage_id", "url", "ip",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_ts"),
        "http_header", "html",
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        count = 0
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=9) as gz:
            for batch in batches:
                for r in batch.itertuples(index=False):
                    header = bytes(r.http_header) if r.http_header is not None else b""
                    body = bytes(r.html) if r.html is not None else b""
                    gz.write(
                        _warc_record(r.wpage_id, r.url, r.ip, r.iso_ts, header, body)
                    )
                    count += 1
        if count:
            _atomic_write(out_dir, ".warc.gz", buf.getvalue())
        yield pd.DataFrame({"n": [count]})

    counts = prepared.mapInPandas(write_partition, "n long")
    return int(counts.agg(F.sum("n")).first()[0] or 0)


def parse_warc_bytes(blob: bytes) -> list[tuple]:
    """Parse (decompressed) WARC/1.0 response records into page tuples.

    The HTTP header/body split uses the first blank line of the payload —
    the same contract the wpage format encodes with explicit lengths."""
    rows = []
    stream = io.BytesIO(blob)
    while True:
        line = stream.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue  # skip separators/padding between records
        fields: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if hline in (b"\r\n", b"\n", b""):
                break
            key, _, val = hline.decode("utf-8").partition(":")
            fields[key.strip().lower()] = val.strip()
        payload = stream.read(int(fields["content-length"]))
        if fields.get("warc-type") != "response":
            continue
        sep = payload.find(_WARC_SEP)
        header, body = (
            (payload[: sep + 4], payload[sep + 4 :]) if sep >= 0 else (b"", payload)
        )
        ts = dt.datetime.strptime(fields["warc-date"], "%Y-%m-%dT%H:%M:%SZ")
        rows.append(
            (
                int(fields.get("warc-x-wpage-id", -1)),
                fields["warc-target-uri"],
                ts,
                body,
                header,
                fields.get("warc-ip-address", ""),
            )
        )
    return rows


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC archives → pages DataFrame (one task per archive file)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(_reader(parse_warc_bytes, False), PAGES_OUT_SCHEMA)
