"""End-to-end resume semantics over the snapshot table layer:
extract → commit → kill-and-retry leaves no duplicates and re-does no
committed work; torn snapshots (no manifest entry) are invisible.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.spark.job import resume_filter, run_extract  # noqa: E402
from pdf_parser_spark.spark.table import SnapshotParquetTable, open_table  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("table-resume-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def pages(spark):
    from fixtures.gen import build_pages_rows

    from tests.test_spark_extract import PAGES_SCHEMA

    import datetime

    rows = [
        (
            url,
            datetime.datetime.utcfromtimestamp(ts / 1_000_000),
            bytearray(data),
            text,
            lang,
        )
        for url, ts, data, text, lang in build_pages_rows(scale=1)
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_snapshot_append_and_read(spark, pages, tmp_path):
    tbl = SnapshotParquetTable(spark, str(tmp_path / "out"))
    assert tbl.read() is None
    first = pages.limit(10).select("url", "warc_ts")
    rec = tbl.append(first)
    assert rec["id"] == 0 and rec["row_count"] == 10
    assert tbl.read().count() == 10
    tbl.append(pages.select("url", "warc_ts").exceptAll(first))
    assert tbl.read().count() == pages.count()
    assert len(tbl.snapshots()) == 2


def test_torn_snapshot_invisible(spark, pages, tmp_path):
    tbl = SnapshotParquetTable(spark, str(tmp_path / "out"))
    tbl.append(pages.limit(5).select("url"))
    # simulate a job that died mid-write: data directory exists but
    # was never committed to the manifest
    pages.limit(3).select("url").write.parquet(str(tmp_path / "out" / "snap-9999"))
    assert tbl.read().count() == 5


def test_resume_skips_committed(spark, pages, tmp_path):
    tbl = SnapshotParquetTable(spark, str(tmp_path / "out"))
    half = pages.filter(F.xxhash64("url") % 2 == 0)
    extracted_half = run_extract(half, threshold=100_000)
    tbl.append(extracted_half)
    n_committed = tbl.read().count()

    remaining = resume_filter(pages, tbl.committed_urls())
    assert remaining.count() == pages.count() - n_committed
    tbl.append(run_extract(remaining, threshold=100_000))

    final = tbl.read()
    assert final.count() == pages.count()
    assert final.select("url").distinct().count() == pages.count()

    # idempotent: a third resume run has nothing to do
    assert resume_filter(pages, tbl.committed_urls()).count() == 0


def test_open_table_dispatch(spark, tmp_path):
    t = open_table(spark, str(tmp_path / "x"))
    assert isinstance(t, SnapshotParquetTable)
    from pdf_parser_spark.spark.table import IcebergTable

    t2 = open_table(spark, "iceberg:cat.db.tbl")
    assert isinstance(t2, IcebergTable)


def test_job_cli_end_to_end(spark, pages, tmp_path):
    """jobs/extract.py as a subprocess: run, then resume-run (no-op)."""
    inp = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "extracted")
    pages.write.parquet(inp)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wet = str(tmp_path / "wet")
    cmd = [
        sys.executable, os.path.join(repo, "jobs", "extract.py"),
        "--input", inp, "--output", out, "--format", "txt",
        "--resume", "--master", "local[2]",
        "--heavy-threshold", "100000",
        "--wet-output", wet,
    ]
    env = {**os.environ, "SPARK_GRAFT_CPUS": "2"}
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["snapshots"][0]["row_count"] == pages.count()
    assert manifest["snapshots"][0]["lineage"]

    # the --wet-output side channel: every doc as a conversion record
    from pdf_parser_spark.sources.warc import parse_warc

    wet_files = sorted(os.listdir(wet))
    assert wet_files and all(f.endswith(".warc.wet.gz") for f in wet_files)
    n_recs = 0
    for f in wet_files:
        recs, errs = parse_warc(open(os.path.join(wet, f), "rb").read())
        assert not errs
        assert all(r["headers"]["warc-type"] == "conversion" for r in recs)
        n_recs += len(recs)
    assert n_recs == pages.count()

    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["snapshots"][1]["row_count"] == 0  # resume: nothing left


def test_job_cli_simple_format_and_page(spark, pages, tmp_path):
    """--format simple (E6) and --page N are reachable from the
    spark-submit entry and match the engine per url."""
    from fixtures.gen import build_pdf_corpus
    from pdf_parser_spark.engine import api
    from pdf_parser_spark.engine.errors import PdfError

    inp = str(tmp_path / "pages.parquet")
    pages.write.parquet(inp)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "SPARK_GRAFT_CPUS": "2"}

    out_simple = str(tmp_path / "simple")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "extract.py"),
         "--input", inp, "--output", out_simple, "--format", "simple",
         "--master", "local[2]", "--heavy-threshold", "100000"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        r_["url"]: r_["text_extracted"]
        for r_ in spark.read.parquet(f"{out_simple}/snap-0000").collect()
    }
    checked = 0
    for cid, data in build_pdf_corpus().items():
        url = f"https://fixtures.test/{cid}/0"
        if url not in got:
            continue
        try:
            expect = api.pdf_to_simple_text(data)
        except PdfError:
            expect = ""
        assert got[url] == expect, cid
        checked += 1
    assert checked >= 20

    out_page = str(tmp_path / "page2")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "extract.py"),
         "--input", inp, "--output", out_page, "--format", "txt",
         "--page", "2", "--master", "local[2]",
         "--heavy-threshold", "100000"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        r_["url"]: r_ for r_ in spark.read.parquet(f"{out_page}/snap-0000").collect()
    }
    multi = "https://fixtures.test/multipage-nested/0"
    single = "https://fixtures.test/min-uncompressed/0"
    assert got[multi]["text_extracted"] == api.pdf_extract(
        build_pdf_corpus()["multipage-nested"], "txt", page=2
    )
    assert got[single]["decode_error_kind"] == "page_range"


def test_package_zip(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "package.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0
    import zipfile

    with zipfile.ZipFile(os.path.join(repo, "dist", "engine.zip")) as z:
        names = z.namelist()
    assert "pdf_parser_spark/engine/api.py" in names
    assert "fixtures/gen.py" in names


# ---------------------------------------------------------------------------
# Iceberg backend: shared-contract tests (VERDICT r2 #6).  The sandbox
# has no Iceberg runtime jar, so the four catalog touchpoints
# (CREATE TABLE DDL, writeTo().append()/create(), read.table(),
# <name>.snapshots metadata query) are emulated with real DataFrames
# held in an in-memory catalog; everything else in IcebergTable runs
# for real.  The parquet backend runs the SAME scenario unemulated, so
# the two backends cannot drift on the contract the job layer uses.
# ---------------------------------------------------------------------------


class _FakeCatalog:
    """In-memory Iceberg-ish catalog: named tables are lists of real
    DataFrames; the main table accrues snapshot metadata per append."""

    def __init__(self):
        self.tables = {}
        self.snaps = {}
        self.ddl = []

    def append(self, name, df):
        if name not in self.tables:
            raise RuntimeError(f"Table {name} does not exist")
        self.tables[name].append(df)
        self.snaps.setdefault(name, []).append(
            {"id": 1000 + len(self.snaps.get(name, [])),
             "committed_at": len(self.snaps.get(name, [])),
             # real Iceberg snapshots carry commit metrics; append()
             # reads row counts from here instead of re-executing df
             "summary": {"added-records": str(df.count())}}
        )

    def create(self, name, df=None):
        self.tables.setdefault(name, [])
        if df is not None:
            self.append(name, df)

    def read(self, name):
        import functools
        dfs = self.tables.get(name, [])
        if not dfs:
            raise RuntimeError(f"Table {name} does not exist or is empty")
        from pyspark.sql import DataFrame as _DF
        return functools.reduce(_DF.unionByName, dfs)


class _FakeWriter:
    def __init__(self, cat, name, df):
        self.cat, self.name, self.df = cat, name, df

    def append(self):
        self.cat.append(self.name, self.df)

    def create(self):
        self.cat.create(self.name, self.df)


class _Rows:
    def __init__(self, dicts):
        self._dicts = dicts

    def collect(self):
        class R(dict):
            def asDict(self):
                return dict(self)
        return [R(d) for d in self._dicts]


@pytest.fixture()
def iceberg_env(spark, monkeypatch):
    """Patch the four catalog touchpoints onto the live session."""
    # patch the CONCRETE classes (pyspark 4's classic.DataFrame
    # overrides the pyspark.sql.DataFrame ABC methods)
    df_cls = type(spark.range(1))
    rdr_cls = type(spark.read)

    cat = _FakeCatalog()
    monkeypatch.setattr(
        df_cls, "writeTo", lambda df, name: _FakeWriter(cat, name, df)
    )
    monkeypatch.setattr(
        rdr_cls, "table", lambda rdr, name: cat.read(name)
    )
    real_sql = spark.sql

    def fake_sql(q, *a, **kw):
        if "CREATE TABLE IF NOT EXISTS" in q and "USING iceberg" in q:
            cat.ddl.append(q)
            cat.create(q.split("CREATE TABLE IF NOT EXISTS ")[1].split(" ")[0])
            return _Rows([])
        if "rewrite_data_files" in q:
            cat.ddl.append(q)
            return _Rows([{"rewritten_data_files_count": 0,
                           "added_data_files_count": 0}])
        if ".snapshots" in q:
            name = q.split("FROM ")[1].split(".snapshots")[0]
            return _Rows(cat.snaps.get(name, []))
        return real_sql(q, *a, **kw)

    monkeypatch.setattr(spark, "sql", fake_sql)
    monkeypatch.setattr(
        type(spark.catalog),
        "tableExists",
        lambda _c, name, db=None: name in cat.tables,
    )
    return cat


def _run_contract_scenario(tbl, spark, pages):
    """The job-layer contract, backend-agnostic: empty-read → append
    with lineage → resume anti-join → append rest → full table, no
    dupes, idempotent resume.  Returns the two append records."""
    from pdf_parser_spark.spark.job import lineage as lineage_of

    assert tbl.read() is None
    assert tbl.committed_urls() is None
    assert tbl.snapshots() == []

    half = pages.filter(F.xxhash64("url") % 2 == 0)
    ex1 = run_extract(half, threshold=100_000)
    lin1 = [r.asDict() for r in lineage_of(ex1).collect()]
    rec1 = tbl.append(ex1, lineage_rows=lin1)
    assert rec1["row_count"] == half.count()
    assert rec1["lineage"] == lin1
    assert len(tbl.snapshots()) == 1

    remaining = resume_filter(pages, tbl.committed_urls())
    assert remaining.count() == pages.count() - half.count()
    rec2 = tbl.append(run_extract(remaining, threshold=100_000))
    assert rec2["id"] != rec1["id"]

    final = tbl.read()
    assert final.count() == pages.count()
    assert final.select("url").distinct().count() == pages.count()
    assert resume_filter(pages, tbl.committed_urls()).count() == 0
    assert len(tbl.snapshots()) == 2
    return rec1, rec2


def test_contract_parquet_backend(spark, pages, tmp_path):
    tbl = open_table(spark, str(tmp_path / "contract"))
    _run_contract_scenario(tbl, spark, pages)


def test_parquet_compaction_preserves_data_and_lineage(spark, pages, tmp_path):
    import glob as _glob

    tbl = open_table(spark, str(tmp_path / "c"))
    assert tbl.compact() is None  # empty table: no-op
    rec1, rec2 = _run_contract_scenario(tbl, spark, pages)
    before = tbl.read().collect()
    files_before = len(_glob.glob(f"{tbl.path}/snap-*/*.parquet"))

    rec = tbl.compact(target_bytes=1 << 30)
    assert rec["compacted_from"] == [rec1["id"], rec2["id"]]
    assert rec["row_count"] == len(before)
    # lineage provenance of both source snapshots carried over
    assert rec["lineage"] == rec1["lineage"] + rec2["lineage"]
    snaps = tbl.snapshots()
    assert [s["id"] for s in snaps] == [rec["id"]]
    # one committed snapshot, sized to one file at this target
    files_after = _glob.glob(
        f"{tbl.path}/{rec['dir']}/*.parquet"
    )
    assert len(files_after) == 1 < files_before
    assert sorted(map(tuple, tbl.read().collect())) == sorted(
        map(tuple, before)
    )
    # ids stay monotone: the next append must not reuse a compacted-
    # away id (its snap dir is still on disk)
    rec3 = tbl.append(tbl.spark.createDataFrame(
        [("u-new", "t", "normal")],
        "url string, text_extracted string, size_class string",
    ))
    assert rec3["id"] == rec["id"] + 1
    assert tbl.compact() is not None  # 2 snaps again

    # single-snapshot table: compact is a no-op
    assert tbl.compact() is None


def test_contract_iceberg_backend(spark, pages, iceberg_env):
    from pdf_parser_spark.spark.table import IcebergTable

    tbl = open_table(spark, "iceberg:cc.db.extracted")
    assert isinstance(tbl, IcebergTable)
    # BEFORE the table is ever created, the resume surface must read
    # as empty — not raise (a fresh --resume run calls committed_urls
    # first; real Iceberg throws AnalysisException on a missing table)
    assert tbl.snapshots() == []
    assert tbl.read() is None
    assert tbl.committed_urls() is None
    tbl.ensure("url string, text_extracted string, size_class string")
    assert len(iceberg_env.ddl) == 1
    assert "USING iceberg" in iceberg_env.ddl[0]
    assert "PARTITIONED BY (size_class)" in iceberg_env.ddl[0]
    # idempotent from a resumed run
    tbl.ensure("url string, text_extracted string, size_class string")

    rec1, _ = _run_contract_scenario(tbl, spark, pages)

    # lineage rows survive in the sibling table, keyed by snapshot id
    lin = iceberg_env.read("cc.db.extracted_lineage").collect()
    assert {r["snapshot_id"] for r in lin} == {rec1["id"]}
    assert all("row_count" in r["lineage_json"] for r in lin)

    # compaction issues the documented maintenance procedure against
    # the table's own catalog with a binpack size target
    out = tbl.compact(target_bytes=256 << 20)
    assert out == {"rewritten_data_files_count": 0,
                   "added_data_files_count": 0}
    call = iceberg_env.ddl[-1]
    assert call.startswith("CALL cc.system.rewrite_data_files(")
    assert "table => 'cc.db.extracted'" in call
    assert "strategy => 'binpack'" in call
    assert f"'target-file-size-bytes', '{256 << 20}'" in call


def test_backend_method_symmetry():
    """The two backends expose the same job-facing surface."""
    import inspect

    from pdf_parser_spark.spark.table import IcebergTable

    for meth in ("append", "read", "committed_urls", "snapshots"):
        ps = inspect.signature(getattr(SnapshotParquetTable, meth)).parameters
        pi = inspect.signature(getattr(IcebergTable, meth)).parameters
        assert list(ps) == list(pi), meth


def test_spark_submit_py_files_launch(spark, pages, tmp_path):
    """The LITERAL north-rule launch mode: `spark-submit --py-files
    dist/engine.zip jobs/extract.py` as an external process, driver
    code resolving the engine from the zip (not the repo checkout).
    The in-process python tests above cover the job logic; this one
    covers the deployment packaging — a missing module in
    scripts/package.py would only ever fail HERE."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "package.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr[-500:]
    inp = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "extracted")
    pages.write.parquet(inp)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--py-files", os.path.join(repo, "dist", "engine.zip"),
         os.path.join(repo, "jobs", "extract.py"),
         "--input", inp, "--output", out, "--format", "txt",
         "--heavy-threshold", "100000"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    assert r.returncode == 0, r.stderr[-3000:]
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["snapshots"][0]["row_count"] == pages.count()
    assert manifest["snapshots"][0]["lineage"]
