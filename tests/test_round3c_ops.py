"""Round-3 third-session operators: gini zonal stat + functional-graph
pointer resolution (redirect chains)."""

import math

import numpy as np
import pyarrow as pa
import pytest


# ---------------- gini ----------------


def test_gini_brute_force():
    from exactextractr_ray.stats import RasterStats

    vals = np.array([1.0, 1.0, 2.0, 3.0, 3.0, 3.0])
    cov = np.array([1.0, 0.5, 0.25, 1.0, 1.0, 0.5])
    st = RasterStats(store_values=True)
    st.process(vals, cov)
    W = cov.sum()
    per = {}
    for v, c in zip(vals, cov):
        per[v] = per.get(v, 0.0) + c
    expect = 1.0 - sum(c * c for c in per.values()) / (W * W)
    assert st.gini() == pytest.approx(expect, abs=0, rel=0)


def test_gini_merge_order_independent():
    from exactextractr_ray.stats import RasterStats

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 9, 64).astype(np.float64)
    cov = rng.integers(1, 5, 64).astype(np.float64) / 4.0  # dyadic

    def build(order):
        whole = RasterStats(store_values=True)
        for i in order:
            part = RasterStats(store_values=True)
            part.process(vals[i::4], cov[i::4])
            whole.merge(part)
        return whole.gini()

    g1 = build([0, 1, 2, 3])
    g2 = build([3, 1, 0, 2])
    one = RasterStats(store_values=True)
    one.process(vals, cov)
    assert g1 == g2 == one.gini()


def test_gini_degenerate():
    from exactextractr_ray.stats import RasterStats

    st = RasterStats(store_values=True)
    assert math.isnan(st.gini())  # empty
    st.process(np.array([5.0, 5.0]), np.array([1.0, 1.0]))
    assert st.gini() == 0.0  # single value -> no impurity


# ---------------- resolve_pointers ----------------


def _state_ds(nodes, targets, blocks=4):
    import ray.data

    tgt = pa.array(
        [None if t is None else int(t) for t in targets], pa.int64()
    )
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(np.asarray(nodes, np.int64), pa.int64()),
             "target": tgt}
        )
    ).repartition(blocks)


def test_resolve_pointers_chain(ray_session):
    from exactextractr_ray.stages.graph import resolve_pointers

    # 0 <- 1 <- 2 <- ... <- 9 (one chain), 10 terminal alone
    nodes = list(range(11))
    targets = [None] + [i - 1 for i in range(1, 10)] + [None]
    df = (
        resolve_pointers(_state_ds(nodes, targets))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert (df["final"][:10] == 0).all()
    assert (df["hops"][:10] == df["node"][:10]).all()
    assert df.loc[10, "final"] == 10 and df.loc[10, "hops"] == 0


def test_resolve_pointers_deep_chain_log_rounds(ray_session):
    """Depth-300 chain resolves under the doubling bound (<= 10 rounds,
    enforced via max_rounds) — walking one hop per round would need 300."""
    from exactextractr_ray.stages.graph import resolve_pointers

    n = 301
    nodes = list(range(n))
    targets = [None] + [i - 1 for i in range(1, n)]
    df = (
        resolve_pointers(_state_ds(nodes, targets), max_rounds=10)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert (df["final"] == 0).all()
    assert (df["hops"].to_numpy() == np.arange(n)).all()


def test_resolve_pointers_cycle_raises(ray_session):
    from exactextractr_ray.stages.graph import resolve_pointers

    with pytest.raises(RuntimeError, match="cycle"):
        resolve_pointers(
            _state_ds([0, 1, 2], [1, 2, 0]), max_rounds=8
        ).to_pandas()


def test_resolve_pointers_all_terminal(ray_session):
    from exactextractr_ray.stages.graph import resolve_pointers

    df = (
        resolve_pointers(_state_ds([4, 7, 9], [None, None, None]))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert (df["final"].to_numpy() == [4, 7, 9]).all()
    assert (df["hops"] == 0).all()


# ---------------- vectorize_components round trip ----------------


def test_vectorize_roundtrip_coverage(ray_session):
    """raster -> vector -> raster closure: the multipolygon WKB of every
    component covers EXACTLY its n_cells cells of the source grid (unit
    coverage on each; run rectangles are interior-disjoint), and all
    covered cells hold the component's value."""
    from exactextractr_ray.coverage import coverage_fraction_wkb
    from exactextractr_ray.pipelines.polygonize import (
        quantize_raster,
        vectorize_components,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray import synth

    n = 32
    rd = quantize_raster(
        synthetic_raster_dataset(n=n, tile=8, dtype=np.float64), 500.0
    )
    df = vectorize_components(rd).to_pandas()
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = np.floor(synth.synth_values(rr, cc) / 500.0)
    # every non-NODATA cell labeled exactly once
    assert df["n_cells"].sum() == np.count_nonzero(~np.isnan(vals))

    grid = synth.synth_grid(n)
    for _, r in df.sort_values("n_cells").tail(5).iterrows():
        cov = coverage_fraction_wkb(grid, r["wkb"])
        assert cov.sum() == r["n_cells"]  # exact: unit cells, dyadic rects
        covered = cov.reshape(n, n) > 0
        assert (cov[cov > 0] == 1.0).all()
        assert (vals[covered] == r["val"]).all()


def test_vectorize_bbox_consistency(ray_session):
    from exactextractr_ray.pipelines.polygonize import vectorize_components
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.pipelines.polygonize import quantize_raster
    from exactextractr_ray import wkbio

    rd = quantize_raster(
        synthetic_raster_dataset(n=16, tile=8, dtype=np.float64), 500.0
    )
    df = vectorize_components(rd).to_pandas()
    for _, r in df.iterrows():
        parts = wkbio.parse_wkb(r["wkb"])
        xmin, ymin, xmax, ymax = wkbio.parts_envelope(parts)
        assert (xmin, ymin, xmax, ymax) == (
            r["xmin"], r["ymin"], r["xmax"], r["ymax"]
        )
        assert len(parts) == r["n_rects"]


# ---------------- raster_pyramid ----------------


def test_raster_pyramid_mass_conservation(ray_session):
    from exactextractr_ray.pipelines.resample import raster_pyramid
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray import synth

    n = 32
    rd = synthetic_raster_dataset(n=n, tile=8, dtype=np.float64)
    df = raster_pyramid(rd, factors=(2, 4, 8), stat="sum").to_pandas()
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(rr, cc)
    total = np.nansum(vals)
    for f in (2, 4, 8):
        lvl = df[df["level"] == f]
        assert lvl["value"].sum() == total  # exact integer mass per level
        assert len(lvl) <= (n // f) ** 2


def test_raster_pyramid_level_values(ray_session):
    """Factor-2 level equals a direct 2x2 block nansum of the source."""
    from exactextractr_ray.pipelines.resample import raster_pyramid
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray import synth

    n = 16
    rd = synthetic_raster_dataset(n=n, tile=8, dtype=np.float64)
    df = raster_pyramid(rd, factors=(2,), stat="sum").to_pandas()
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(rr, cc).reshape(n, n)
    blocks = np.nansum(
        vals.reshape(n // 2, 2, n // 2, 2), axis=(1, 3)
    )
    got = dict(zip(df["cell"].astype(int), df["value"]))
    for r in range(n // 2):
        for c in range(n // 2):
            cell = r * (n // 2) + c
            if np.isnan(vals.reshape(n, n)[2*r:2*r+2, 2*c:2*c+2]).all():
                assert cell not in got
            else:
                assert got[cell] == blocks[r, c]


# ---------------- mixture_sample ----------------


def _docs_ds(groups, ids):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(groups, pa.string()),
                "doc_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            }
        )
    ).repartition(4)


def test_mixture_sample_quotas_exact(ray_session):
    from exactextractr_ray.stages.shuffle import mixture_sample

    groups = ["a"] * 10 + ["b"] * 10 + ["c"] * 10
    ids = list(range(30))
    # weights 3:2:1, total 10 -> base (5, 3, 1), remainders (0, 20//6..)
    # 10*3//6=5 r0; 10*2//6=3 r2; 10*1//6=1 r4 -> leftover 1 -> 'c' (+1)
    out = mixture_sample(
        _docs_ds(groups, ids), "source",
        weights={"a": 3, "b": 2, "c": 1}, total=10,
    ).to_pandas()
    cnt = out.groupby("source")["doc_id"].count()
    assert cnt["a"] == 5 and cnt["b"] == 3 and cnt["c"] == 2
    assert len(out) == 10


def test_mixture_sample_overflow_quota(ray_session):
    """Quota above a group's population returns the whole group."""
    from exactextractr_ray.stages.shuffle import mixture_sample

    out = mixture_sample(
        _docs_ds(["a"] * 2 + ["b"] * 10, range(12)), "source",
        weights={"a": 9, "b": 1}, total=10,
    ).to_pandas()
    cnt = out.groupby("source")["doc_id"].count()
    assert cnt["a"] == 2 and cnt["b"] == 1  # a capped at population


def test_mixture_sample_zero_total(ray_session):
    from exactextractr_ray.stages.shuffle import mixture_sample

    out = mixture_sample(
        _docs_ds(["a", "b"], [0, 1]), "source",
        weights={"a": 1, "b": 1}, total=0,
    ).to_pandas()
    assert len(out) == 0


def test_mixture_sample_deterministic_membership(ray_session):
    """Same quota -> same members regardless of partitioning."""
    from exactextractr_ray.stages.shuffle import mixture_sample

    groups = [f"g{i % 3}" for i in range(60)]
    a = mixture_sample(
        _docs_ds(groups, range(60)).repartition(2), "source",
        weights={"g0": 1, "g1": 1, "g2": 1}, total=12,
    ).to_pandas().sort_values("doc_id")["doc_id"].tolist()
    b = mixture_sample(
        _docs_ds(groups, range(60)).repartition(7), "source",
        weights={"g0": 1, "g1": 1, "g2": 1}, total=12,
    ).to_pandas().sort_values("doc_id")["doc_id"].tolist()
    assert a == b and len(a) == 12


# ---------------- bpe_pair_counts ----------------


def test_bpe_pair_counts_unicode_and_ties(ray_session):
    import ray.data
    from collections import Counter
    from exactextractr_ray.stages.text import bpe_pair_counts

    texts = ["abab", "héllo wörld", "日本語テキスト", "", "x"]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(3)
    out = bpe_pair_counts(ds, k=100).to_pandas()
    brute = Counter()
    for t in texts:
        for i in range(len(t) - 1):
            brute[t[i:i + 2]] += 1
    expect = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))
    got = list(zip(out["pair"], out["cnt"]))
    assert got == expect


def test_bpe_pair_counts_empty(ray_session):
    import ray.data
    from exactextractr_ray.stages.text import bpe_pair_counts

    ds = ray.data.from_arrow(
        pa.table({"text": pa.array([], pa.string())})
    )
    assert len(bpe_pair_counts(ds).to_pandas()) == 0


# ---------------- pareto_front ----------------


def _brute_front(price, date):
    keep = []
    for i in range(len(price)):
        dom = False
        for j in range(len(price)):
            if i == j:
                continue
            if (
                price[j] >= price[i]
                and date[j] <= date[i]
                and (price[j] > price[i] or date[j] < date[i])
            ):
                dom = True
                break
        keep.append(not dom)
    return np.array(keep)


def test_pareto_front_vs_brute(ray_session):
    import ray.data
    from exactextractr_ray.stages.rank import pareto_front

    rng = np.random.default_rng(11)
    n = 300
    price = rng.integers(0, 40, n).astype(np.float64)  # many ties
    date = rng.integers(0, 40, n).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "p": pa.array(price),
                  "d": pa.array(date)})
    ).repartition(5)
    out = pareto_front(ds, max_col="p", min_col="d", id_col="id").to_pandas()
    keep = _brute_front(price, date)
    expect = set(ids[keep])
    assert set(out["id"]) == expect
    # sorted contract
    assert (
        out.sort_values(["p", "d", "id"], ascending=[False, True, True])
        .reset_index(drop=True)["id"]
        .equals(out["id"])
    )


def test_pareto_front_duplicates_kept(ray_session):
    import ray.data
    from exactextractr_ray.stages.rank import pareto_front

    # two identical optimal points -> both survive; a dominated third dies
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "p": pa.array([9.0, 9.0, 5.0]),
                "d": pa.array([1.0, 1.0, 2.0]),
            }
        )
    ).repartition(2)
    out = pareto_front(ds, "p", "d", "id").to_pandas()
    assert sorted(out["id"]) == [1, 2]


# ---------------- upsert_merge ----------------


def _kv_ds(rows, blocks=3):
    import ray.data

    k, v, val = zip(*rows) if rows else ((), (), ())
    return ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(np.asarray(k, np.int64), pa.int64()),
                "version": pa.array(np.asarray(v, np.int64), pa.int64()),
                "val": pa.array(np.asarray(val, np.int64), pa.int64()),
            }
        )
    ).repartition(blocks)


def test_upsert_merge_latest_wins(ray_session):
    from exactextractr_ray.stages.web import upsert_merge

    base = _kv_ds([(1, 1, 10), (2, 1, 20), (3, 1, 30)])
    upd = _kv_ds([(2, 2, 99), (4, 1, 40)])
    out = (
        upsert_merge(base, upd, key_col="key")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert out["key"].tolist() == [1, 2, 3, 4]
    assert out["val"].tolist() == [10, 99, 30, 40]
    assert out["version"].tolist() == [1, 2, 1, 1]


def test_upsert_merge_tie_updates_win(ray_session):
    from exactextractr_ray.stages.web import upsert_merge

    base = _kv_ds([(7, 3, 70)])
    upd = _kv_ds([(7, 3, 77)])  # same version -> updates side wins
    out = upsert_merge(base, upd, key_col="key").to_pandas()
    assert out["val"].tolist() == [77]


def test_upsert_merge_empty_updates(ray_session):
    from exactextractr_ray.stages.web import upsert_merge

    base = _kv_ds([(1, 1, 10), (2, 1, 20)])
    upd = _kv_ds([])
    out = (
        upsert_merge(base, upd, key_col="key")
        .to_pandas()
        .sort_values("key")
    )
    assert out["val"].tolist() == [10, 20]


# ---------------- end-to-end: curate -> shards -> resume -> pack ----------------


def test_end_to_end_curate_shard_pack(ray_session, tmp_path):
    """The full training-data flow on real fixtures: curate the corpus,
    write it as resumable key-range parquet shards, prove the resume skip,
    read the shards back and sequence-pack them — every major subsystem
    (curation, lineage sink, source, packing) in one chain."""
    import ray.data

    from exactextractr_ray.pipelines.curate import curate_corpus
    from exactextractr_ray.stages.pack import pack_sequences, token_count_batch
    from exactextractr_ray.state.lineage import read_resumable, resumable_write

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    kept = curate_corpus(docs).to_pandas()
    kept_ids = frozenset(int(i) for i in kept["doc_id"])
    assert len(kept_ids) > 50  # fixture sanity

    # 4 key-range shards; factory re-filters the streaming source
    out_dir = str(tmp_path / "corpus")
    hi = max(kept_ids) + 1
    step = (hi + 3) // 4
    parts = {f"r{i}": (i * step, min((i + 1) * step, hi)) for i in range(4)}

    def factory(key, spec):
        lo, hi_ = spec

        def f(b):
            import numpy as np
            import pyarrow as pa

            ids = b.column("doc_id").to_numpy()
            keep = (ids >= lo) & (ids < hi_) & np.fromiter(
                (int(i) in kept_ids for i in ids), dtype=bool, count=len(ids)
            )
            return b.filter(pa.array(keep))

        return docs.map_batches(f, batch_format="pyarrow")

    r1 = resumable_write(out_dir, "corpus", parts, factory, "fp-v1")
    assert sorted(r1["written"]) == sorted(parts)
    r2 = resumable_write(out_dir, "corpus", parts, factory, "fp-v1")
    assert sorted(r2["skipped"]) == sorted(parts) and not r2["written"]

    shards = read_resumable(out_dir)
    assert shards.count() == len(kept_ids)

    packed = pack_sequences(shards, budget=64).to_pandas()
    # every token of every kept doc lands in exactly one example span
    tok = (
        shards.map_batches(
            lambda b: token_count_batch(b, "doc_id", "text"),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    total_tokens = int(tok["n"].sum())
    spans = (packed["tok_end"] - packed["tok_start"]).sum()
    assert spans == total_tokens
    # spans within a doc are disjoint and ordered
    for _, g in packed.groupby("doc_id"):
        g = g.sort_values("tok_start")
        assert (g["tok_start"].to_numpy()[1:] >= g["tok_end"].to_numpy()[:-1]).all()


# ---------------- geohash ----------------


def test_geohash_canonical_values():
    """The textbook vector: (57.64911 N, 10.40744 E) -> u4pruydq (our
    8 chars = 40 bits = exactly the 20+20-bit quantization)."""
    from exactextractr_ray.stages.spatial import geohash_batch

    b = pa.table(
        {
            "lon": pa.array([10.40744, -5.6, 0.0], pa.float64()),
            "lat": pa.array([57.64911, 42.6, 0.0], pa.float64()),
        }
    )
    out = geohash_batch(b)
    gh = out.column("geohash").to_pylist()
    assert gh[0] == "u4pruydq"
    assert gh[1].startswith("ezs42")  # the other classic example cell
    assert gh[2] == "s0000000"  # origin


def test_geohash_prefix_nesting():
    from exactextractr_ray.stages.spatial import geohash_batch

    base_lon, base_lat = 12.34, 45.67
    eps = 1e-4
    b = pa.table(
        {
            "lon": pa.array([base_lon, base_lon + eps], pa.float64()),
            "lat": pa.array([base_lat, base_lat + eps], pa.float64()),
        }
    )
    gh = geohash_batch(b).column("geohash").to_pylist()
    assert gh[0][:5] == gh[1][:5]  # nearby points share the parent prefix


# ---------------- defensive I/O: malformed containers ----------------


def test_geotiff_rejects_garbage(tmp_path):
    from exactextractr_ray.sources.geotiff import read_geotiff

    p = tmp_path / "bad.tif"
    p.write_bytes(b"NOTATIFF" * 4)
    with pytest.raises(ValueError, match="TIFF"):
        read_geotiff(str(p))


def test_geotiff_rejects_truncated(tmp_path):
    import numpy as np

    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff
    from exactextractr_ray.grid import Grid

    p = tmp_path / "t.tif"
    write_geotiff(
        np.arange(64, dtype=np.float64).reshape(8, 8),
        Grid(0, 0, 8, 8, 1, 1),
        str(p),
    )
    data = p.read_bytes()
    (tmp_path / "trunc.tif").write_bytes(data[: len(data) // 3])
    with pytest.raises(Exception):  # struct/ValueError — never a hang/garbage
        read_geotiff(str(tmp_path / "trunc.tif"))


def test_gpkg_rejects_non_gpkg_blob():
    from exactextractr_ray.sources.gpkg import _strip_gpkg_header

    with pytest.raises(ValueError, match="GeoPackage"):
        _strip_gpkg_header(b"XX\x00\x00garbage")


# ---------------- WARC source ----------------


def _warc_records(n=6):
    return [
        {
            "url": f"https://ex{i}.org/p",
            "warc_ts": f"2024-01-0{i+1}T00:00:00Z",
            "html": f"<html><body>doc {i} é</body></html>".encode(),
            "http_status": 200 if i % 2 == 0 else 404,
        }
        for i in range(n)
    ]


def test_warc_roundtrip_plain_and_gzip(ray_session, tmp_path):
    from exactextractr_ray.sources.warc import read_warc, write_warc

    recs = _warc_records()
    p1 = str(tmp_path / "a.warc")
    p2 = str(tmp_path / "b.warc.gz")
    write_warc(p1, recs[:3])
    write_warc(p2, recs[3:], gzip_members=True)  # the Common Crawl layout
    df = (
        read_warc([p1, p2])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(df) == 6
    for i, r in enumerate(sorted(recs, key=lambda r: r["url"])):
        assert df.loc[i, "url"] == r["url"]
        assert df.loc[i, "warc_ts"] == r["warc_ts"]
        assert bytes(df.loc[i, "html"]) == r["html"]
        assert df.loc[i, "http_status"] == r["http_status"]


def test_warc_skips_non_response_records(tmp_path):
    from exactextractr_ray.sources.warc import parse_warc_bytes, write_warc

    p = str(tmp_path / "c.warc")
    write_warc(p, _warc_records(2))
    data = open(p, "rb").read()
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n"
        b"robot\r\n\r\n"
    )
    open(p, "wb").write(info + data)
    recs = parse_warc_bytes(open(p, "rb").read())
    assert len(recs) == 2  # warcinfo skipped


def test_warc_rejects_garbage():
    from exactextractr_ray.sources.warc import parse_warc_bytes

    import pytest as _pytest

    with _pytest.raises(ValueError, match="WARC"):
        parse_warc_bytes(b"this is not a warc file")


def test_warc_feeds_extract_links(ray_session, tmp_path):
    """WARC -> the standard crawl chain: html flows into the link extractor
    unchanged (the point of matching the pages schema)."""
    from exactextractr_ray.sources.warc import read_warc, write_warc
    from exactextractr_ray.stages.web import extract_links_batch

    recs = [
        {
            "url": "https://a.org/",
            "warc_ts": "2024-01-01T00:00:00Z",
            "html": b'<html><a href="https://b.org/x">t</a></html>',
        }
    ]
    p = str(tmp_path / "d.warc")
    write_warc(p, recs)
    ds = read_warc([p]).map_batches(
        lambda b: extract_links_batch(
            b.append_column("doc_id", pa.array([7], pa.int64())),
        ),
        batch_format="pyarrow",
    )
    df = ds.to_pandas()
    assert df["href"].tolist() == ["https://b.org/x"]
    assert df["src_doc"].tolist() == [7]


# ---------------- profile_columns ----------------


def test_profile_columns_with_nulls(ray_session):
    import ray.data
    from exactextractr_ray.stages.profile import profile_columns

    t = pa.table(
        {
            "k": pa.array([3, 1, None, 3, 2], pa.int64()),
            "s": pa.array(["b", None, "a", "b", "c"], pa.string()),
        }
    )
    df = (
        profile_columns(ray.data.from_arrow(t).repartition(3), ["k", "s"])
        .to_pandas()
        .set_index("col")
    )
    assert df.loc["k", "n"] == 5 and df.loc["k", "n_null"] == 1
    assert df.loc["k", "n_distinct"] == 3
    assert df.loc["k", "min_s"] == "1" and df.loc["k", "max_s"] == "3"
    assert df.loc["s", "n_distinct"] == 3
    assert df.loc["s", "min_s"] == "a" and df.loc["s", "max_s"] == "c"


def test_profile_columns_rejects_unsupported(ray_session):
    import ray.data
    from exactextractr_ray.stages.profile import profile_columns

    t = pa.table({"f": pa.array([1.5, 2.5], pa.float64())})
    with pytest.raises(Exception, match="unsupported"):
        profile_columns(ray.data.from_arrow(t), ["f"]).to_pandas()


def test_check_constraints_kinds(ray_session):
    import ray.data
    from exactextractr_ray.stages.profile import check_constraints

    t = pa.table(
        {
            "k": pa.array([1, 2, 2, None], pa.int64()),
            "s": pa.array(["a", "x", "a", None], pa.string()),
            "v": pa.array([5.0, -1.0, 50.0, 200.0], pa.float64()),
        }
    )
    df = (
        check_constraints(
            ray.data.from_arrow(t).repartition(2),
            [
                {"kind": "unique", "col": "k"},
                {"kind": "not_null", "col": "s"},
                {"kind": "in_set", "col": "s", "values": ["a", "b"]},
                {"kind": "range", "col": "v", "lo": 0.0, "hi": 100.0},
            ],
        )
        .to_pandas()
        .set_index(["constraint", "col"])["n_violations"]
    )
    assert df[("unique", "k")] == 1       # 2 appears twice (nulls excluded)
    assert df[("not_null", "s")] == 1     # one null
    assert df[("in_set", "s")] == 2       # 'x' and the null
    assert df[("range", "v")] == 2        # -1 and 200


def test_t5_spans_properties(ray_session):
    """Spans are non-overlapping, block-aligned, clipped to the doc's
    token count, and ~1/7 of blocks are masked."""
    import ray.data
    from exactextractr_ray.stages.text import t5_span_masks

    texts = ["w " * k for k in (1, 2, 3, 10, 50, 200)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array([t.strip() for t in texts], pa.string()),
            }
        )
    ).repartition(2)
    df = t5_span_masks(ds).to_pandas().sort_values(["doc_id", "span_start"])
    ntok = {i: k for i, k in enumerate((1, 2, 3, 10, 50, 200))}
    for _, r in df.iterrows():
        assert r["span_start"] % 3 == 0
        assert r["span_end"] <= ntok[int(r["doc_id"])]
        assert r["span_end"] > r["span_start"]
    for _, g in df.groupby("doc_id"):
        s = g["span_start"].to_numpy()
        e = g["span_end"].to_numpy()
        assert (s[1:] >= e[:-1]).all()


def test_profile_columns_numeric_looking_strings(ray_session):
    """Regression (round-4 ADVICE): a STRING column whose values look
    numeric ('9' vs '10' — zip codes, version strings) must keep
    lexicographic VARCHAR min/max semantics at BOTH levels (per-batch
    partial and global combine). The old finalizer sniffed digits and
    re-parsed as int, giving min='9' where SQL VARCHAR min is '10'."""
    import ray.data
    from exactextractr_ray.stages.profile import profile_columns

    t = pa.table(
        {
            "zip": pa.array(["9", "10", "200", "9", "10"], pa.string()),
            "k": pa.array([9, 10, 200, 9, 10], pa.int64()),
        }
    )
    df = (
        profile_columns(ray.data.from_arrow(t).repartition(3), ["zip", "k"])
        .to_pandas()
        .set_index("col")
    )
    # string column: lexicographic (matches DuckDB VARCHAR min/max)
    assert df.loc["zip", "min_s"] == "10" and df.loc["zip", "max_s"] == "9"
    assert df.loc["zip", "n_distinct"] == 3
    # int column: numeric
    assert df.loc["k", "min_s"] == "9" and df.loc["k", "max_s"] == "200"
