"""wpage/ARC round-trip (S4/S5), reprocess path (S14), post-tools."""

import os

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def pages(spark, fixture_dir):
    return (
        spark.read.parquet(f"{fixture_dir}/pages.parquet")
        .withColumn("wpage_id", F.monotonically_increasing_id())
        .cache()
    )


class TestArcRoundTrip:
    def test_write_read_arc(self, spark, pages, tmp_path):
        from macocu_crawler_spark.sources.wpage import read_arc, write_arc

        out = str(tmp_path / "arc")
        n = write_arc(pages, out)
        assert n == pages.count()
        back = read_arc(spark, f"{out}/*.arc.gz")
        orig = {r.url: (bytes(r.html), bytes(r.http_header))
                for r in pages.select("url", "html", "http_header").collect()}
        got = {r.url: (bytes(r.html), bytes(r.http_header))
               for r in back.select("url", "html", "http_header").collect()}
        assert got == orig  # byte-identical round trip

    def test_no_filename_collision_across_reused_workers(self, spark, pages, tmp_path):
        """ADVICE r2: Spark reuses Python workers across partitions, so a
        (pid, record-count) filename collides whenever one worker writes two
        equal-sized partitions, silently overwriting an archive.  With more
        equal-sized partitions than cores, worker reuse is guaranteed — every
        record must still be present and file count must equal partition
        count."""
        import glob

        from macocu_crawler_spark.sources.wpage import read_arc, write_arc

        cores = spark.sparkContext.defaultParallelism
        n_parts = cores * 2
        # equal-sized partitions: round-robin repartition of a multiple
        total = pages.count()
        df = pages.limit(total - total % n_parts).repartition(n_parts)
        out = str(tmp_path / "arc_many")
        n = write_arc(df, out)
        assert n == df.count()
        files = glob.glob(f"{out}/*.arc.gz")
        assert len(files) == n_parts, (len(files), n_parts)
        assert read_arc(spark, f"{out}/*.arc.gz").count() == n

    def test_atomic_attempt_writes_last_wins_whole(self, tmp_path):
        """ADVICE r3: stageId-partitionId is identical across task ATTEMPTS
        — a speculative attempt and its retry racing open(path, 'wb') on
        the same final name could tear the archive.  Writes now land on an
        attempt-unique temp name and os.rename onto the final path: rename
        is atomic, so whichever attempt finishes last leaves a WHOLE file,
        and no temp droppings survive."""
        import glob
        import os
        from unittest import mock

        from macocu_crawler_spark.sources import wpage

        out = str(tmp_path / "arc")
        os.makedirs(out)
        # two 'attempts' of the same task: same final name, distinct attempt
        with mock.patch.object(
            wpage, "_task_part_id", return_value=("7-00003", "7-00003.attempt-41")
        ):
            wpage._atomic_write(out, ".arc.gz", b"attempt-41 payload")
        with mock.patch.object(
            wpage, "_task_part_id", return_value=("7-00003", "7-00003.attempt-99")
        ):
            wpage._atomic_write(out, ".arc.gz", b"attempt-99 payload xxxx")
        files = sorted(os.listdir(out))
        assert files == ["part-7-00003.arc.gz"]  # one final file, no temps
        with open(os.path.join(out, files[0]), "rb") as f:
            assert f.read() == b"attempt-99 payload xxxx"  # last attempt, whole
        assert glob.glob(f"{out}/.part-*") == []
        # the dead-temp sweep is AGE-GATED: an hours-old temp (attempt died
        # between write and rename) is reclaimed, but a fresh sibling temp
        # — possibly a LIVE speculative attempt about to rename — survives
        dead = os.path.join(out, ".part-7-00003.attempt-13.arc.gz")
        live = os.path.join(out, ".part-7-00003.attempt-77.arc.gz")
        for p in (dead, live):
            with open(p, "wb") as f:
                f.write(b"x")
        os.utime(dead, (1, 1))  # epoch-old mtime
        with mock.patch.object(
            wpage, "_task_part_id", return_value=("7-00003", "7-00003.attempt-100")
        ):
            wpage._atomic_write(out, ".arc.gz", b"attempt-100 payload")
        assert not os.path.exists(dead)
        assert os.path.exists(live)

    def test_write_read_warc(self, spark, pages, tmp_path):
        """WARC/1.0 export round trip: byte-identical payloads, preserved
        ids/ips/timestamps, deterministic record ids (re-export equal)."""
        from macocu_crawler_spark.sources.wpage import read_warc, write_warc

        out = str(tmp_path / "warc")
        n = write_warc(pages, out)
        assert n == pages.count()
        back = read_warc(spark, f"{out}/*.warc.gz")
        orig = {r.url: (bytes(r.html), bytes(r.http_header), r.ip, r.warc_ts)
                for r in pages.select("url", "html", "http_header", "ip",
                                      "warc_ts").collect()}
        got = {r.url: (bytes(r.html), bytes(r.http_header), r.ip, r.warc_ts)
               for r in back.select("url", "html", "http_header", "ip",
                                    "warc_ts").collect()}
        assert got == orig
        out2 = str(tmp_path / "warc2")
        write_warc(pages.coalesce(1), out2)
        import glob
        import gzip as _gz

        blobs = sorted(
            _gz.open(p, "rb").read() for p in glob.glob(f"{out2}/*.warc.gz")
        )
        blobs1 = sorted(
            _gz.open(p, "rb").read() for p in glob.glob(f"{out}/*.warc.gz")
        )
        assert b"".join(blobs).count(b"WARC/1.0") == b"".join(blobs1).count(b"WARC/1.0")

    def test_reprocess_from_arc_equals_direct(self, spark, pages, tmp_path):
        """S14: ARC → pipeline == pages → pipeline (the reference's
        reprocess regression harness)."""
        from macocu_crawler_spark.operators.extract import extract_documents
        from macocu_crawler_spark.sources.wpage import read_arc, write_arc

        out = str(tmp_path / "arc2")
        write_arc(pages, out)
        from_arc = extract_documents(read_arc(spark, f"{out}/*.arc.gz"))
        direct = extract_documents(pages)
        a = {r.url: r.text for r in from_arc.select("url", "text").collect()}
        b = {r.url: r.text for r in direct.select("url", "text").collect()}
        assert a == b


class TestWpageFormat:
    def test_parse_reference_framing(self, spark, tmp_path):
        from macocu_crawler_spark.sources.wpage import read_wpage

        header = b"HTTP/1.1 200 OK\r\n\r\n"
        body = "<html><body><p>hei p\xe5 deg</p></body></html>".encode("utf-8")
        record = (
            f"7 http://x.no/a.html http x.no /a.html 1.2.3.4 20230815100000 "
            f"{len(header)} {len(body)}\n"
        ).encode("utf-8") + header + body
        path = tmp_path / "wpage0"
        path.write_bytes(record * 3)
        df = read_wpage(spark, str(path))
        rows = df.collect()
        assert len(rows) == 3
        assert rows[0].url == "http://x.no/a.html"
        assert bytes(rows[0].html) == body
        assert rows[0].ip == "1.2.3.4"


class TestPostTools:
    def test_remove_duplicates(self, spark):
        from macocu_crawler_spark.operators.posttools import remove_duplicates

        docs = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "wpage_id long, text string"
        )
        dups = spark.createDataFrame([(3,)], "wpage_id long")
        assert {r.wpage_id for r in remove_duplicates(docs, dups).collect()} == {1, 2}

    def test_paragraph_class_filter(self, spark):
        from macocu_crawler_spark.operators.posttools import paragraph_class_filter

        prevert = (
            '<doc id="1" title="t">\n'
            '<p class="good" cfclass="good" langdiff="0.10">\nbra tekst\n</p>\n'
            '<p class="bad" cfclass="short" langdiff="0.20">\nnav\n</p>\n'
            "\n</doc>\n"
        )
        only_bad = '<doc id="2" title="t">\n<p class="bad" cfclass="bad" langdiff="0.9">\nx\n</p>\n</doc>\n'
        docs = spark.createDataFrame(
            [(1, prevert), (2, only_bad)], "wpage_id long, prevert string"
        )
        out = paragraph_class_filter(docs, ("good",)).collect()
        assert len(out) == 1
        assert 'class="good"' in out[0].prevert
        assert 'class="bad"' not in out[0].prevert

    def test_urls_waiting_reformat(self, spark):
        from macocu_crawler_spark.operators.posttools import urls_waiting_reformat

        rows = [("http", "ok.no", f"/p{i:03d}.html", f"/p{i:03d}.html", 0, i)
                for i in range(10)]
        rows.append(("http", "x" * 60 + ".no", "/a", "/a", 0, 99))
        frontier = spark.createDataFrame(
            rows,
            "scheme string, host string, path string, path_sanitised string,"
            " batch_id long, seq long",
        )
        out = urls_waiting_reformat(frontier, max_paths_per_host=4)
        got = out.collect()
        assert len(got) == 4
        assert all(r.host == "ok.no" for r in got)
        assert sorted(r.seq for r in got) == [0, 1, 2, 3]  # selection order kept
