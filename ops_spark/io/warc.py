"""WARC (ISO 28500) source — the container format web-crawl corpora ship
in (CommonCrawl's WARC/WET files are the raw input of every public LLM
pretraining pipeline).

The reference has no WARC surface; this is part of the training-data
source family this engine adds. Implemented via PySpark's Python Data
Source API (the same surface as io/pysource.py): ``partitions()`` plans
one InputPartition PER FILE — WARC is a stream format that is not
byte-splittable without an external index, and real pipelines
parallelize across the many thousands of ~1 GB segment files a crawl
ships, not within one file (CommonCrawl publishes ~72k files per crawl;
at 1000 executors that is 72 waves of perfectly even file-granular
work). Per-record gzip members (the actual ``.warc.gz`` layout) are
supported transparently: Python's gzip stream reader concatenates
members, which is exactly why the format gzips per record — any record
boundary is also a member boundary, so a future index-based splitter
can seek.

Writer + parser are pure stdlib, deterministic (fixed mtime=0 in gzip
headers), so fixtures regenerate byte-identically and oracles can
re-derive every aggregate from the source tables.
"""

from __future__ import annotations

import glob
import gzip
import io
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WARC_DDL = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_length bigint, payload binary"
)


def encode_warc_record(r: dict, record_gzip: bool = True) -> bytes:
    """Serialize ONE record (record_id, warc_type, target_uri, warc_date,
    payload bytes) to its on-disk form. record_gzip=True yields one gzip
    member (the standard .warc.gz layout); mtime is pinned to 0 so output
    bytes are deterministic. Self-delimiting, so writers can append
    records one at a time (chunked staging) or in bulk identically."""
    payload = r["payload"]
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {r['warc_type']}\r\n"
        f"WARC-Record-ID: {r['record_id']}\r\n"
        f"WARC-Target-URI: {r['target_uri']}\r\n"
        f"WARC-Date: {r['warc_date']}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    rec = head + payload + b"\r\n\r\n"
    if record_gzip:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        rec = buf.getvalue()
    return rec


def write_warc(
    path: str,
    records: list[dict],
    record_gzip: bool = True,
) -> None:
    """Write records to one WARC file (see encode_warc_record)."""
    with open(path, "wb") as f:
        for r in records:
            f.write(encode_warc_record(r, record_gzip))


def parse_warc_stream(fobj):
    """Yield record dicts from a decompressed WARC byte stream. Tolerates
    any amount of CRLF padding between records (the spec requires exactly
    two CRLFs; crawlers vary)."""
    while True:
        # skip inter-record CRLF padding to the next version line
        line = fobj.readline()
        while line in (b"\r\n", b"\n"):
            line = fobj.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line!r}")
        headers: dict[str, str] = {}
        while True:
            line = fobj.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            k, _, v = line.decode("utf-8").partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers["content-length"])
        payload = fobj.read(n)
        if len(payload) != n:
            raise ValueError(
                f"truncated record: wanted {n} payload bytes, got {len(payload)}"
            )
        yield {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_length": n,
            "payload": payload,
        }


@dataclass
class _WarcFile(InputPartition):
    path: str


class WarcReader(DataSourceReader):
    """One partition per WARC file — the crawl-pipeline unit of
    parallelism (see module docstring for why WARC does not byte-split)."""

    def __init__(self, options: dict) -> None:
        self.pattern = options["path"]

    def partitions(self) -> list[_WarcFile]:
        paths = sorted(glob.glob(os.path.join(self.pattern, "*.warc*")))
        if not paths:
            paths = sorted(glob.glob(self.pattern))
        if not paths:
            raise FileNotFoundError(f"no WARC files under {self.pattern}")
        return [_WarcFile(p) for p in paths]

    # records per yielded Arrow batch: bounds reader memory per file while
    # keeping the per-batch serialization overhead amortized (~512 rows of
    # headers+payload is a few MB for typical crawl pages)
    BATCH_ROWS = 512

    @staticmethod
    def _to_batch(recs: list[dict]):
        import pyarrow as pa

        return pa.RecordBatch.from_arrays(
            [
                pa.array([r["record_id"] for r in recs], pa.string()),
                pa.array([r["warc_type"] for r in recs], pa.string()),
                pa.array([r["target_uri"] for r in recs], pa.string()),
                pa.array([r["warc_date"] for r in recs], pa.string()),
                pa.array([r["content_length"] for r in recs], pa.int64()),
                pa.array([r["payload"] for r in recs], pa.binary()),
            ],
            names=[
                "record_id",
                "warc_type",
                "target_uri",
                "warc_date",
                "content_length",
                "payload",
            ],
        )

    def read(self, partition: _WarcFile):
        # yield pyarrow.RecordBatch, not per-row tuples: the Python Data
        # Source API ships Arrow batches across the worker boundary whole,
        # skipping the per-row pickle round-trip (the ArrowEvalPythonExec
        # lesson applied to the source side — crawl ingest is the widest
        # Python-boundary path in the pipeline)
        opener = gzip.open if partition.path.endswith(".gz") else open
        buf: list[dict] = []
        with opener(partition.path, "rb") as f:
            for r in parse_warc_stream(f):
                buf.append(r)
                if len(buf) >= self.BATCH_ROWS:
                    yield self._to_batch(buf)
                    buf = []
        if buf:
            yield self._to_batch(buf)


class WarcDataSource(DataSource):
    """spark.read.format("warclite").option("path", dir).load()"""

    @classmethod
    def name(cls) -> str:
        return "warclite"

    def schema(self) -> str:
        return WARC_DDL

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration of the warclite format."""
    try:
        spark.dataSource.register(WarcDataSource)
    except Exception:
        pass  # already registered in this session


def stage_documents_warc(sf_dir: str, html: bool = False) -> str:
    """Stage the documents fixture as .warc.gz files (idempotent, keyed on
    source mtime so regenerated derived datasets re-stage). html=True
    wraps each payload in the deterministic HTML template (script decoy,
    entities, fixed furniture) and gives every record the MESSY tracking
    URL whose doc_id%50 collisions URL-dedup must find — the raw-crawl
    shape the llm_crawl_pipeline capstone consumes. html=False writes
    plain-text payloads with distinct URIs (the source_warc roundtrip
    fixture)."""
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}:{'html' if html else 'plain'}".encode()
    ).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"ops_spark_warc_{digest}")
    done = os.path.join(d, "_done")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    # CHUNKED staging: iterate Arrow record batches and append each WARC
    # record to its target file as it streams past — memory stays one
    # batch deep however large the derived multiple gets (the whole-table
    # to_pylist this replaces was fine for fixtures but driver-bulk at
    # bigger multiples). Output bytes stay deterministic for a given
    # source file: parquet row order is stable and every record is
    # self-delimiting (per-record gzip member, mtime=0).
    n_files = 4
    handles = [
        open(os.path.join(d, f"part-{i:04d}.warc.gz"), "wb")
        for i in range(n_files)
    ]
    try:
        import pyarrow.dataset as pds

        # dataset, not ParquetFile: the source may be a single file
        # (fixtures) or a directory of part files (derived multiples);
        # fragment discovery is filename-ordered, so batch order — and
        # therefore output bytes — is deterministic per source
        for rb in pds.dataset(src, format="parquet").to_batches(
            batch_size=16384, columns=["doc_id", "text", "source", "lang"]
        ):
            for doc_id, text, source, lang in zip(
                rb["doc_id"].to_pylist(),
                rb["text"].to_pylist(),
                rb["source"].to_pylist(),
                rb["lang"].to_pylist(),
            ):
                if html:
                    body = (
                        "<html><head><title>t</title><style>p{color:red}"
                        '</style><script>var x = "<p>not text</p>";'
                        "</script></head><body>"
                        f"<!-- nav --><p>{text}</p>"
                        "<div>footer &amp; more &lt;tags&gt;</div>"
                        "</body></html>"
                    )
                    uri = (
                        f"HTTPS://WWW.{source.upper()}.Example.COM:443/{lang}"
                        f"/Article-{doc_id % 50}/?utm_source=feed&ref=rss"
                        f"&id={doc_id % 50}&utm_campaign=x#sec{doc_id % 7}"
                    )
                else:
                    body = text
                    uri = f"https://{source}.example.com/doc/{doc_id}"
                rec = {
                    "record_id": f"<urn:uuid:doc-{doc_id}>",
                    "warc_type": "revisit" if doc_id % 4 == 0 else "response",
                    "target_uri": uri,
                    "warc_date": "2024-01-01T00:00:00Z",
                    "payload": body.encode("utf-8"),
                }
                handles[doc_id % n_files].write(encode_warc_record(rec))
    finally:
        for h in handles:
            h.close()
    open(done, "w").close()
    return d
