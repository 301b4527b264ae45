"""CLI surface tests (reference Program.cs flows E1/E2/E3)."""

from __future__ import annotations

import json
import sqlite3

import pytest

from dataingestionplayground_spark import cli


@pytest.fixture()
def cms_db(tmp_path):
    db = tmp_path / "CMS.DB"
    con = sqlite3.connect(db)
    con.execute(
        'CREATE TABLE "Items" ("Id" INTEGER PRIMARY KEY AUTOINCREMENT,'
        ' "Title" TEXT NOT NULL, "Body" TEXT NOT NULL)'
    )
    con.execute(
        'INSERT INTO "Items" ("Title", "Body") VALUES (?, ?)',
        ("Databases", "A database is an organized collection of data.\n\nManaged by a DBMS."),
    )
    con.commit()
    con.close()
    return str(db)


def test_cli_ingest_list_search_roundtrip(spark, cms_db, tmp_path, capsys):
    store = str(tmp_path / "store")
    rc = cli.main(
        ["ingest", "--reader", "database", "--source", cms_db, "--collection", "docs",
         "--store", store]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "Article #1: SUCCESS" in out

    rc = cli.main(["list", "--store", store])
    assert rc == 0 and capsys.readouterr().out.strip() == "docs"

    rc = cli.main(
        ["search", "--collection", "docs", "--store", store,
         "--query", "organized collection of data", "--top-k", "1"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "documentid=Article #1" in out and "context: Databases" in out


def test_cli_config_defaults(spark, cms_db, tmp_path, capsys):
    cfg = tmp_path / "appsettings.json"
    cfg.write_text(json.dumps({
        "store_path": str(tmp_path / "store2"),
        "collection": "cfgcoll",
        "database_source": cms_db,
    }))
    rc = cli.main(["--config", str(cfg), "ingest", "--reader", "database"])
    assert rc == 0 and "SUCCESS" in capsys.readouterr().out
    cli.main(["--config", str(cfg), "list"])
    assert capsys.readouterr().out.strip() == "cfgcoll"


def test_cli_unknown_reader_rejected():
    with pytest.raises(SystemExit):
        cli.main(["ingest", "--reader", "nope"])


def test_cli_jsonl_and_csv_readers(spark, tmp_path, capsys):
    import json as _json

    jl = tmp_path / "corpus.jsonl"
    jl.write_text(
        _json.dumps({"doc_id": "j1", "text": "jsonl document about databases"}) + "\n"
        + _json.dumps({"doc_id": "j2", "text": ""}) + "\n"  # empty -> FAILURE
    )
    store = str(tmp_path / "store")
    rc = cli.main(["ingest", "--reader", "jsonl", "--source", str(jl),
                   "--collection", "jd", "--store", store])
    out = capsys.readouterr().out
    assert "j1: SUCCESS" in out and "j2: FAILURE" in out and rc == 1

    cs = tmp_path / "corpus.csv"
    cs.write_text('doc_id,text\nc1,"csv document about spark engines"\n')
    rc = cli.main(["ingest", "--reader", "csv", "--source", str(cs),
                   "--collection", "cd", "--store", store])
    assert "c1: SUCCESS" in capsys.readouterr().out and rc == 0

    rc = cli.main(["search", "--collection", "jd", "--store", store,
                   "--query", "databases", "--top-k", "1"])
    assert "documentid=j1" in capsys.readouterr().out


def test_cli_info(spark, cms_db, tmp_path, capsys):
    store = str(tmp_path / "store")
    cli.main(["ingest", "--reader", "database", "--source", cms_db,
              "--collection", "docs", "--store", store])
    capsys.readouterr()
    rc = cli.main(["info", "--collection", "docs", "--store", store])
    out = capsys.readouterr().out
    assert rc == 0 and "documents:  1" in out and "dims:       384" in out
    assert cli.main(["info", "--collection", "nope", "--store", store]) == 2


def test_cli_dedup_report(spark, tmp_path, capsys):
    # two identical docs + one distinct -> exact-unique 2, kept 2
    src = tmp_path / "md"
    src.mkdir()
    body = "# T\n\nthe quick brown fox jumps over the lazy dog again and again"
    (src / "a.md").write_text(body)
    (src / "b.md").write_text(body)
    (src / "c.md").write_text("# U\n\ncompletely different words about spark engines here")
    store = str(tmp_path / "store")
    assert cli.main(["ingest", "--reader", "markdown", "--collection", "dd",
                     "--source", str(src), "--store", store]) == 0
    capsys.readouterr()
    out_pq = str(tmp_path / "keep.parquet")
    assert cli.main(["dedup", "--collection", "dd", "--store", store,
                     "--out", out_pq]) == 0
    out = capsys.readouterr().out
    assert "documents:        3" in out
    assert "exact-unique:     2" in out
    assert "kept after dedup: 2" in out
    kept = {r.documentid: r.is_kept for r in spark.read.parquet(out_pq).collect()}
    assert sum(kept.values()) == 2
    # unknown collection -> error exit
    assert cli.main(["dedup", "--collection", "nope", "--store", store]) == 2


def test_cli_export_jsonl(spark, tmp_path, capsys):
    import json
    import os

    src = tmp_path / "md"
    src.mkdir()
    (src / "a.md").write_text("# A\n\nalpha beta gamma delta epsilon")
    (src / "b.md").write_text("# B\n\nzeta eta theta iota kappa")
    store = str(tmp_path / "store")
    assert cli.main(["ingest", "--reader", "markdown", "--collection", "ex",
                     "--source", str(src), "--store", store]) == 0
    capsys.readouterr()
    out_dir = str(tmp_path / "export")
    assert cli.main(["export", "--collection", "ex", "--store", store,
                     "--out", out_dir, "--shards", "2"]) == 0
    out = capsys.readouterr().out
    assert "wrote 2 docs" in out
    manifest = json.load(open(os.path.join(out_dir, "_MANIFEST.json")))
    assert manifest["total_rows"] == 2
    back = spark.read.json(out_dir)
    names = {r.documentid.rsplit("/", 1)[-1] for r in back.select("documentid").collect()}
    assert names == {"a.md", "b.md"}
    # unknown collection -> error exit
    assert cli.main(["export", "--collection", "nope", "--store", store,
                     "--out", str(tmp_path / "x")]) == 2


def test_cli_xml_reader(spark, tmp_path, capsys):
    src = tmp_path / "xml"
    src.mkdir()
    (src / "a.xml").write_text(
        "<docs>"
        "<article><doc_id>x1</doc_id><text>alpha beta gamma delta epsilon zeta</text></article>"
        "<article><doc_id>x2</doc_id><text>eta theta iota kappa lambda mu</text></article>"
        "</docs>"
    )
    store = str(tmp_path / "store")
    assert cli.main(["ingest", "--reader", "xml", "--collection", "xm",
                     "--source", str(src), "--store", store]) == 0
    out = capsys.readouterr().out
    assert "x1: SUCCESS" in out and "x2: SUCCESS" in out
    assert cli.main(["search", "--collection", "xm", "--store", store,
                     "--query", "alpha beta gamma", "--top-k", "1"]) == 0
    assert "x1" in capsys.readouterr().out


def test_cli_curate_full_funnel(spark, tmp_path, capsys):
    import json as _json
    import os

    corpus = tmp_path / "corpus.jsonl"
    boiler = "Subscribe to our newsletter today"
    rows = [
        # a and b are EXACT duplicates (caught by stage 1, so their
        # shared fox line never counts as cross-doc boilerplate)
        {"doc_id": "a", "text": f"the quick brown fox jumps over the lazy dog\n{boiler}"},
        {"doc_id": "b", "text": f"the quick brown fox jumps over the lazy dog\n{boiler}"},
        {"doc_id": "c", "text": "a completely different sentence with many common english words here"},
        # doc that is ONLY boilerplate -> dropped at stage 1
        {"doc_id": "d", "text": boiler},
        # contaminated doc: shares a trigram with the eval set
        {"doc_id": "e", "text": "this exact benchmark question appears verbatim in the eval set"},
    ]
    corpus.write_text("".join(_json.dumps(r) + "\n" for r in rows))
    ev = tmp_path / "eval.jsonl"
    ev.write_text(_json.dumps({"doc_id": "ev1", "text": "exact benchmark question appears"}) + "\n")

    out_dir = str(tmp_path / "curated")
    rc = cli.main([
        "curate", "--source", str(corpus), "--out", out_dir,
        "--eval-source", str(ev), "--quality-pct", "0", "--shards", "2",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "input docs:        5" in out
    assert "after exact dedup: 4" in out   # b is an exact duplicate of a
    assert "after boilerplate: 3" in out   # shared line erased; d left empty
    assert "after quality:     3" in out   # pct=0 keeps all survivors
    assert "after decontam:    2" in out   # e shares eval trigrams
    manifest = _json.load(open(os.path.join(out_dir, "_MANIFEST.json")))
    assert manifest["total_rows"] == 2
    back = spark.read.json(out_dir)
    assert {r.doc_id for r in back.select("doc_id").collect()} == {"a", "c"}


def test_cli_sql_frontend(spark, capsys):
    rc = cli.main([
        "sql",
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name LIMIT 2",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.splitlines()[0] == "r_name\tn"
    assert "(2 row(s))" in out


def test_cli_curate_without_eval_source(spark, tmp_path, capsys):
    import json as _json

    corpus = tmp_path / "c2.jsonl"
    corpus.write_text(
        _json.dumps({"doc_id": "x", "text": "one unique document with plenty of ordinary words"}) + "\n"
        + _json.dumps({"doc_id": "y", "text": "another distinct document containing different words"}) + "\n"
    )
    out_dir = str(tmp_path / "curated2")
    rc = cli.main(["curate", "--source", str(corpus), "--out", out_dir,
                   "--quality-pct", "0", "--shards", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "after decontam:    2" in out  # stage skipped -> passthrough count
    assert spark.read.json(out_dir).count() == 2


def test_cli_indexed_search_matches_bruteforce(spark, md_fixture_dir, tmp_path, capsys):
    """`search --index pq|ivf` must return the brute-force top-k on the
    fixture corpus (verdict r6 item 6): IVF probing every cell is exact
    by construction; the PQ path's ADC shortlist + exact rerank recovers
    the exact ranking on a corpus this size. The ensure_index front door
    builds on first use and is silent/current on the second."""
    store = str(tmp_path / "store")
    rc = cli.main(
        ["ingest", "--reader", "markdown", "--source", md_fixture_dir,
         "--collection", "docs", "--store", store]
    )
    assert rc == 0
    capsys.readouterr()

    def hits(extra):
        args = ["search", "--collection", "docs", "--store", store,
                "--query", "machine learning algorithms", "--top-k", "3"] + extra
        assert cli.main(args) == 0
        cap = capsys.readouterr()
        lines = [l for l in cap.out.splitlines() if l.startswith("score=")]
        return [l.split("documentid=")[1] for l in lines], cap.err

    brute, _ = hits([])
    ivf, err1 = hits(["--index", "ivf", "--n-probe", "8"])  # all cells -> exact
    assert ivf == brute
    assert "ivf index built" in err1
    ivf2, err2 = hits(["--index", "ivf", "--n-probe", "8"])
    assert ivf2 == brute and "built" not in err2 and "refreshed" not in err2

    pq, perr = hits(["--index", "pq"])
    assert pq == brute
    assert "pq index built" in perr

    # incremental ingest makes the index stale -> next search refreshes
    extra_dir = tmp_path / "extra_md"
    extra_dir.mkdir()
    src = sorted(__import__("pathlib").Path(md_fixture_dir).glob("*.md"))[0]
    (extra_dir / "zz-extra.md").write_text(src.read_text())
    rc = cli.main(
        ["ingest", "--reader", "markdown", "--source", str(extra_dir),
         "--collection", "docs", "--store", store, "--incremental"]
    )
    assert rc == 0
    capsys.readouterr()
    _, err3 = hits(["--index", "ivf", "--n-probe", "8"])
    assert "ivf index refreshed" in err3


def test_cli_index_lifecycle(spark, md_fixture_dir, tmp_path, capsys):
    """`index build|merge|signal|refresh|compact` — the operational
    surface of the maintained IVF index (r14): build freezes centroids,
    merge epoch-stages a chunk-batch parquet, signal prints the skew
    gate as JSON, refresh finds nothing left to reconcile, compact
    folds the epoch tags."""
    import json as _json

    from pyspark.sql import functions as F

    store = str(tmp_path / "store")
    rc = cli.main(
        ["ingest", "--reader", "markdown", "--source", md_fixture_dir,
         "--collection", "docs", "--store", store]
    )
    assert rc == 0
    capsys.readouterr()

    assert cli.main(["index", "build", "--collection", "docs", "--store", store,
                     "--cells", "4"]) == 0
    assert "built IVF index: 4 cells" in capsys.readouterr().out

    # a new document arrives; its chunks become the merge batch
    rc = cli.main(
        ["ingest", "--reader", "markdown", "--source", md_fixture_dir,
         "--collection", "docs2", "--store", store]
    )
    assert rc == 0
    capsys.readouterr()
    from dataingestionplayground_spark.ingest import CollectionStore

    st = CollectionStore(store)
    batch_path = str(tmp_path / "batch.parquet")
    (
        st.read(spark, "docs2")
        .select("key", "documentid", "embedding")
        .withColumn("documentid", F.concat(F.col("documentid"), F.lit("-inc")))
        .withColumn("key", F.concat(F.col("key"), F.lit("-inc")))
        .write.parquet(batch_path)
    )
    assert cli.main(["index", "merge", "--collection", "docs", "--store", store,
                     "--batch", batch_path, "--epoch", "3"]) == 0
    assert "merged epoch 3" in capsys.readouterr().out

    assert cli.main(["index", "signal", "--collection", "docs",
                     "--store", store]) == 0
    sig = _json.loads(capsys.readouterr().out.strip())
    assert sig["n_cells"] == 4 and sig["n_assigned"] > 0
    assert isinstance(sig["retrain"], bool)

    # the merged keys are not store chunks, so refresh treats them as
    # orphans — the reconcile path the merge contract documents
    assert cli.main(["index", "refresh", "--collection", "docs",
                     "--store", store]) == 0
    out = capsys.readouterr().out
    assert "appended=0" in out

    assert cli.main(["index", "compact", "--collection", "docs",
                     "--store", store]) == 0
    assert "compacted" in capsys.readouterr().out


def test_cli_index_pq_kind(spark, md_fixture_dir, tmp_path, capsys):
    """`index --kind pq` drives the PQ code table's build/merge/compact
    lifecycle through the CLI."""
    from pyspark.sql import functions as F

    store = str(tmp_path / "store")
    assert cli.main(
        ["ingest", "--reader", "markdown", "--source", md_fixture_dir,
         "--collection", "docs", "--store", store]
    ) == 0
    capsys.readouterr()

    assert cli.main(["index", "build", "--kind", "pq", "--collection", "docs",
                     "--store", store]) == 0
    assert "built PQ index" in capsys.readouterr().out

    from dataingestionplayground_spark.ingest import CollectionStore

    st = CollectionStore(store)
    batch_path = str(tmp_path / "pqbatch.parquet")
    (
        st.read(spark, "docs")
        .limit(3)
        .select("key", "documentid", "embedding")
        .withColumn("key", F.concat(F.col("key"), F.lit("-inc")))
        .write.parquet(batch_path)
    )
    assert cli.main(["index", "merge", "--kind", "pq", "--collection", "docs",
                     "--store", store, "--batch", batch_path, "--epoch", "2"]) == 0
    assert "3 code rows staged" in capsys.readouterr().out
    assert cli.main(["index", "compact", "--kind", "pq", "--collection", "docs",
                     "--store", store]) == 0
    assert "3 staged code rows folded" in capsys.readouterr().out
