"""WARC source: write/read round-trip equals the canonical webpages
table; gzip-per-record (Common Crawl layout) reads identically; the
extraction invariant holds end-to-end from WARC."""

import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    synth_warc_files,
    write_warc,
)
from fdblucene_ray.sources.webpages import extract_text, generate_webpages


class TestWarcRoundTrip:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip_identity(self, tmp_path, ray_session, gz):
        want = generate_webpages(0, 120)
        paths = synth_warc_files(
            str(tmp_path / ("gz" if gz else "plain")), 120,
            rows_per_file=50, gzip_per_record=gz,
        )
        assert len(paths) == 3
        got = read_warc(paths).to_pandas().sort_values("url").reset_index(
            drop=True
        )
        w = want.to_pandas().sort_values("url").reset_index(drop=True)
        assert got["url"].tolist() == w["url"].tolist()
        assert got["warc_ts"].tolist() == w["warc_ts"].tolist()
        assert [bytes(x) for x in got["html"]] == [
            bytes(x) for x in w["html"]
        ]

    def test_extraction_invariant_from_warc(self, tmp_path, ray_session):
        want = generate_webpages(0, 40)
        p = write_warc(str(tmp_path / "x.warc"), want)
        got = read_warc([p]).to_pandas()
        texts = {r.url: extract_text(bytes(r.html)) for r in got.itertuples()}
        w = want.to_pandas()
        for r in w.itertuples():
            want_text = (
                r.text.encode() if isinstance(r.text, str) else bytes(r.text)
            )
            assert texts[r.url] == want_text, r.url

    def test_binary_payload_with_crlf_survives(self, tmp_path):
        # payload bytes containing WARC-like markers must not confuse
        # the Content-Length-chained parser
        evil = b"<html><body>x\r\n\r\nWARC/1.0\r\nContent-Length: 9</body></html>"
        t = pa.table(
            {
                "url": pa.array(["https://e.com/1", "https://e.com/2"]),
                "warc_ts": pa.array([1_000_000, 2_000_000], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "html": pa.array([evil, b"<html><body>ok</body></html>"]),
            }
        )
        p = write_warc(str(tmp_path / "evil.warc"), t)
        out = parse_warc_bytes(open(p, "rb").read())
        assert out.num_rows == 2
        assert out["html"][0].as_py() == evil

    def test_non_response_records_skipped(self):
        rec = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"abcd\r\n\r\n"
        )
        out = parse_warc_bytes(rec)
        assert out.num_rows == 0


class TestWarcToParquet:
    def test_conversion_resumable_and_search_identical(
        self, tmp_path, ray_session
    ):
        """WARC -> parquet -> flagship index must be SEARCH-IDENTICAL
        to the index built from the canonical parquet twin of the same
        rows, and re-running the conversion must skip published shards
        unread."""
        import os

        import pyarrow.parquet as pq

        from fdblucene_ray.index.search import Searcher
        from fdblucene_ray.pipelines.flagship import build_webpages_index
        from fdblucene_ray.sources.warc import synth_warc_files, warc_to_parquet
        from fdblucene_ray.sources.webpages import synth_webpages_parquet

        warcs = synth_warc_files(
            str(tmp_path / "warc"), 200, rows_per_file=50,
            gzip_per_record=True,
        )
        shards = warc_to_parquet(warcs, str(tmp_path / "pq"))
        assert len(shards) == 4
        # resumable: tamper-probe one shard dir entry, re-run, unchanged
        mt = {p: os.path.getmtime(p) for p in shards}
        shards2 = warc_to_parquet(warcs, str(tmp_path / "pq"))
        assert shards2 == shards
        assert all(os.path.getmtime(p) == mt[p] for p in shards)

        twin = synth_webpages_parquet(
            str(tmp_path / "twin"), 200, rows_per_file=50,
        )
        # same logical rows, same shard layout
        a = pq.read_table(shards[0], columns=["url", "text"])
        b = pq.read_table(twin[0], columns=["url", "text"])
        assert a.equals(b)

        ix_w = str(tmp_path / "ixw")
        ix_t = str(tmp_path / "ixt")
        build_webpages_index(shards, ix_w, num_partitions=4)
        build_webpages_index(twin, ix_t, num_partitions=4)
        hw = Searcher(ix_w).search_terms(["term7"], 10, mode="wand")
        ht = Searcher(ix_t).search_terms(["term7"], 10, mode="wand")
        assert hw == ht
