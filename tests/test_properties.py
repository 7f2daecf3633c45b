"""Property-based tests (hypothesis): invariants that hold for arbitrary
inputs, complementing the golden/oracle checks."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_pg_etl_spark.operators.spatial import (
    _pair_intersection_points,
    _segments_intersect,
    _split_polyline,
)


def _weighted_median_reference(pairs):
    """Direct re-implementation of general-functions.sql:52-75 semantics."""
    pairs = sorted(pairs, key=lambda p: p[0])
    weights = [0.0 if w is None else w for _, w in pairs]
    total = sum(weights)
    half = total / 2
    run, hits = 0.0, []
    for (x, _), w in zip(pairs, weights):
        prev = run
        run += w
        if prev <= half <= run:
            hits.append(x)
    return sum(hits) / len(hits) if hits else None


@st.composite
def xw_pairs(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    xs = draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n,
                       unique=True))
    ws = draw(st.lists(st.integers(0, 20), min_size=n, max_size=n))
    return [(float(x), float(w)) for x, w in zip(xs, ws)]


class TestWeightedMedianProperty:
    """One Spark session per class run; data-driven via hypothesis."""

    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark

    @settings(max_examples=12, deadline=None)
    @given(pairs=xw_pairs())
    def test_matches_reference_semantics(self, pairs):
        from osm_pg_etl_spark.operators.stats import weighted_median

        df = self.spark.createDataFrame(pairs, "x double, w double")
        got = weighted_median(df, "x", "w").collect()[0]["weighted_median"]
        want = _weighted_median_reference(pairs)
        # distinct integer xs: ties at the midpoint average identically
        assert got == pytest.approx(want)


coord = st.integers(-5, 5).map(float)


@settings(max_examples=200, deadline=None)
@given(st.tuples(coord, coord, coord, coord),
       st.tuples(coord, coord, coord, coord))
def test_intersection_predicate_symmetric(a, b):
    ax = np.array([a[0], a[2]]); ay = np.array([a[1], a[3]])
    bx = np.array([b[0], b[2]]); by = np.array([b[1], b[3]])
    assert _segments_intersect(ax, ay, bx, by) \
        == _segments_intersect(bx, by, ax, ay)


@settings(max_examples=200, deadline=None)
@given(st.tuples(coord, coord, coord, coord),
       st.tuples(coord, coord, coord, coord))
def test_intersection_points_lie_on_both_bboxes(a, b):
    ax = np.array([a[0], a[2]]); ay = np.array([a[1], a[3]])
    bx = np.array([b[0], b[2]]); by = np.array([b[1], b[3]])
    eps = 1e-9
    for px, py in _pair_intersection_points(ax, ay, bx, by):
        assert min(ax) - eps <= px <= max(ax) + eps
        assert min(bx) - eps <= px <= max(bx) + eps
        assert min(ay) - eps <= py <= max(ay) + eps
        assert min(by) - eps <= py <= max(by) + eps


@st.composite
def polyline(draw):
    n = draw(st.integers(min_value=2, max_value=6))
    pts = draw(st.lists(st.tuples(coord, coord), min_size=n, max_size=n))
    # drop consecutive duplicates (zero-length segments)
    out = [pts[0]]
    for p in pts[1:]:
        if p != out[-1]:
            out.append(p)
    if len(out) < 2:
        out.append((out[0][0] + 1.0, out[0][1]))
    return out


def _length(parts):
    return sum(
        math.dist(part[i], part[i + 1])
        for part in parts for i in range(len(part) - 1))


@settings(max_examples=150, deadline=None)
@given(line=polyline(), cuts=st.lists(st.tuples(coord, coord), max_size=4))
def test_split_preserves_total_length(line, cuts):
    xs = np.array([p[0] for p in line])
    ys = np.array([p[1] for p in line])
    parts = _split_polyline(xs, ys, cuts)
    assert _length(parts) == pytest.approx(_length([line]), abs=1e-9)
    for part in parts:
        assert len(part) >= 2
    # parts chain: each part starts where the previous ended
    for prev, nxt in zip(parts, parts[1:]):
        assert prev[-1] == nxt[0]


def test_unnest_way_nodes_roundtrip(spark, osm):
    from osm_pg_etl_spark.operators.topology import unnest_way_nodes

    got = sorted((r["way_id"], r["node_id"], r["sequence_id"]) for r in
                 unnest_way_nodes(osm["ways"]).collect())
    want = sorted((r["way_id"], r["node_id"], r["sequence_id"]) for r in
                  osm["way_nodes"].collect())
    assert got == want


# --- deterministic bucket / Morton-code invariants (round 3) -----------------

@given(st.lists(st.integers(-10**9, 10**9), min_size=0, max_size=60),
       st.integers(-10**9, 10**9),
       st.integers(-10**9, 10**9))
@settings(max_examples=200, deadline=None)
def test_bucket_of_monotone_for_any_boundaries(bounds, k1, k2):
    """bucket_of must be monotone in the key for ANY boundary list — the
    property the distributed prefix sums rely on. Pure-python mirror of
    the Column expression (count of boundaries strictly below the key)."""
    bounds = sorted(set(bounds))

    def bucket(k):
        return sum(1 for b in bounds if k > b)

    lo, hi = min(k1, k2), max(k1, k2)
    assert bucket(lo) <= bucket(hi)
    assert 0 <= bucket(k1) <= len(bounds)


@given(st.integers(0, 2**15 - 1), st.integers(0, 2**15 - 1),
       st.integers(0, 2**15 - 1), st.integers(0, 2**15 - 1))
@settings(max_examples=200, deadline=None)
def test_morton_code_order_preserving_per_axis(a1, b1, a2, b2):
    """Morton codes preserve dominance: if a1<=a2 and b1<=b2 then
    z(a1,b1) <= z(a2,b2) — the property that makes Z-order ranges prune
    rectangles. Also: codes are injective."""
    def z(a, b, bits=15):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    if a1 <= a2 and b1 <= b2:
        assert z(a1, b1) <= z(a2, b2)
    if (a1, b1) != (a2, b2):
        assert z(a1, b1) != z(a2, b2)


@given(st.lists(st.tuples(st.integers(1, 10**6), st.text("ab", min_size=0,
                                                         max_size=3)),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_bloom_membership_pure_python_no_false_negatives(items):
    """Pure-python mirror of bloom_build/bloom_might_contain bit math: any
    inserted value must probe true for any (bits_log2, num_hashes)."""
    import hashlib

    m, k = 1 << 10, 3
    words: dict[int, int] = {}
    vals = [f"{i}|{t}" for i, t in items]
    for v in vals:
        for s in range(1, k + 1):
            pos = int(hashlib.md5(f"{s}|{v}".encode()).hexdigest()[:8],
                      16) % m
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    for v in vals:
        for s in range(1, k + 1):
            pos = int(hashlib.md5(f"{s}|{v}".encode()).hexdigest()[:8],
                      16) % m
            mask = 1 << (pos % 32)
            assert words.get(pos // 32, 0) & mask == mask


@given(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6),
       st.integers(1, 64), st.integers(-10**7, 10**7))
def test_stride_predicates_partition_every_value(lower, upper, n, v):
    """Every integer matches exactly one stride predicate — no row lost or
    duplicated regardless of bounds, partition count, or out-of-range
    values (the property a JDBC parallel read depends on)."""
    from osm_pg_etl_spark.sources.jdbc import stride_predicates

    preds = stride_predicates("id", lower, upper, n)

    def matches(pred: str, val: int) -> bool:
        # evaluate the SQL predicate in Python (id <op> literal forms only)
        clauses = pred.split(" OR ")
        ok = False
        for c in clauses:
            c = c.strip()
            if c == "id IS NULL":
                continue
            if c == "id IS NOT NULL":
                ok = True
            elif " AND " in c:
                lo_s, hi_s = c.split(" AND ")
                ok = ok or (val >= int(lo_s.split(">= ")[1])
                            and val < int(hi_s.split("< ")[1]))
            elif c.startswith("id >= "):
                ok = ok or val >= int(c.split(">= ")[1])
            elif c.startswith("id < "):
                ok = ok or val < int(c.split("< ")[1])
        return ok

    assert sum(matches(p, v) for p in preds) == 1


def _lpa_reference(edge_list: list, n_iter: int) -> dict:
    """Plain-Python synchronous LPA oracle: most-frequent neighbour label,
    ties broken to the smallest label."""
    adj: dict[int, list[int]] = {}
    for u, v in edge_list:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    labels = {x: x for x in adj}
    for _ in range(n_iter):
        nxt = {}
        for x, ns in adj.items():
            freq: dict[int, int] = {}
            for nb in ns:
                freq[labels[nb]] = freq.get(labels[nb], 0) + 1
            best = max(freq.values())
            nxt[x] = min(l for l, c in freq.items() if c == best)
        labels = nxt
    return labels


@given(st.lists(st.tuples(st.integers(0, 500), st.integers(0, 500)),
                min_size=1, max_size=40),
       st.integers(1, 5))
def test_lpa_reference_oracle_self_consistent(edge_list, n_iter):
    """The plain-Python LPA oracle is total and deterministic on arbitrary
    random graphs (labels defined for every node, drawn from node ids) —
    the Spark parity test below reuses it on seeded fixed graphs."""
    edge_list = [(u, v) for u, v in edge_list if u != v]
    if not edge_list:
        return
    labels = _lpa_reference(edge_list, n_iter)
    nodes = {x for e in edge_list for x in e}
    assert set(labels) == nodes
    assert set(labels.values()) <= nodes


def test_lpa_reference_parity_spark_batch(spark):
    """Run seeded random graphs through the real operator in one Spark
    session (per-case sessions would be minutes of overhead). Cases are
    generated locally with a fixed seed — self-contained under -k
    selection and pytest-xdist, unlike harvesting hypothesis cases from
    another test in the same process."""
    import random

    from osm_pg_etl_spark.operators.graph_algo import label_propagation

    rng = random.Random(42)
    cases = []
    for i in range(8):
        n_nodes = rng.randint(2, 30)
        n_edges = rng.randint(1, 40)
        raw = [(rng.randint(0, n_nodes), rng.randint(0, n_nodes))
               for _ in range(n_edges)]
        # label_propagation works on the deduplicated undirected edge set
        # (symmetric_edges applies distinct()); canonicalize so the
        # multiplicity-counting Python oracle sees the same graph
        edge_list = sorted({(min(u, v), max(u, v))
                            for u, v in raw if u != v}) or [(0, 1)]
        n_iter = rng.randint(1, 5)
        cases.append((edge_list, n_iter, _lpa_reference(edge_list, n_iter)))
    for edge_list, n_iter, want in cases:
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        got = {r["node"]: r["community"]
               for r in label_propagation(edges, n_iter=n_iter).collect()}
        assert got == want, (edge_list, n_iter)


# ---------------------------------------------------------------- r12 codecs

def _bpe_reference_merge(symbols, left, right):
    """Greedy left-to-right non-overlapping merge of (left, right) over
    a symbol list — the textbook BPE apply step."""
    out, i = [], 0
    while i < len(symbols):
        if (i + 1 < len(symbols) and symbols[i] == left
                and symbols[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@given(st.lists(st.sampled_from(["a", "b", "ab", "ba", "aab"]),
                min_size=1, max_size=20),
       st.sampled_from([("a", "b"), ("a", "a"), ("ab", "a"), ("b", "ba")]))
@settings(max_examples=200, deadline=None)
def test_bpe_space_wrap_replace_equals_greedy_merge(symbols, pair):
    """The space-wrapped literal replace used by operators/bpe (and its
    DuckDB oracle) implements EXACTLY the greedy left-to-right
    non-overlapping merge, for arbitrary symbol sequences including
    self-overlapping ones — symbols that are prefixes/suffixes of each
    other cannot corrupt the encoding."""
    left, right = pair
    s = "".join(f" {t} " for t in symbols)
    merged_str = s.replace(f" {left}  {right} ", f" {left}{right} ")
    got = merged_str.strip(" ").split("  ") if merged_str.strip() else []
    assert got == _bpe_reference_merge(symbols, left, right)


@st.composite
def msvc_frames(draw):
    """1-4 frames on the RGB555 lattice, each block <= 2 colors (the
    format's exactly-representable subset), with random inter-frame
    block reuse."""
    bw = draw(st.integers(1, 3))
    bh = draw(st.integers(1, 3))
    n = draw(st.integers(1, 4))
    frames = []
    prev = None
    for _ in range(n):
        f = np.zeros((bh * 4, bw * 4), dtype=np.uint16)
        for by in range(bh):
            for bx in range(bw):
                if prev is not None and draw(st.booleans()):
                    f[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4] = \
                        prev[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4]
                    continue
                qa = draw(st.integers(0, 31))
                qb = draw(st.integers(0, 31))
                ca = (qa << 10) | (qa << 5) | qa
                cb = (qb << 10) | (qb << 5) | qb
                patt = np.array(
                    [draw(st.integers(0, 1)) for _ in range(16)]
                ).reshape(4, 4)
                f[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4] = \
                    np.where(patt == 1, ca, cb)
        frames.append(f)
        prev = f
    return frames


@given(msvc_frames())
@settings(max_examples=60, deadline=None)
def test_msvideo1_container_roundtrip_property(frames):
    """Any representable frame sequence — arbitrary dims, 2-color
    blocks, random temporal reuse — survives the CRAM AVI round trip
    pixel-exactly."""
    from osm_pg_etl_spark.functions.avicodec import (decode_avi,
                                                     encode_avi_msvc)
    from osm_pg_etl_spark.functions.msvideo1 import rgb555_to_rgb888

    rgb = [rgb555_to_rgb888(f) for f in frames]
    dec, _ = decode_avi(encode_avi_msvc(rgb))
    assert len(dec) == len(rgb)
    assert all(np.array_equal(a, b) for a, b in zip(rgb, dec))


@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=400),
       st.lists(st.integers(-32768, 32767), min_size=2, max_size=400))
@settings(max_examples=50, deadline=None)
def test_stereo_adpcm_channels_independent(left, right):
    """Stereo ADPCM must decode each channel exactly as the mono codec
    would decode it alone — the interleave adds layout, not coupling."""
    from osm_pg_etl_spark.functions.audiocodec import (
        adpcm_decode_stereo, adpcm_encode_stereo)

    n = min(len(left), len(right))
    pcm = np.stack([np.array(left[:n]), np.array(right[:n])],
                   axis=1).astype(np.int32)
    dec = adpcm_decode_stereo(adpcm_encode_stereo(pcm, 64), 64)
    # each block header carries the channel's first sample verbatim,
    # and each channel advances an independent IMA state machine —
    # block-seed exactness is the layout-independent invariant
    per_block = 64 - 8 + 1
    for c in range(2):
        for off in range(0, n, per_block):
            assert dec[off, c] == pcm[off, c]


@given(st.integers(0, 400), st.integers(1, 4))
@settings(max_examples=120, deadline=None)
def test_msvideo1_truncation_never_hangs_or_misparses(cut, nframes):
    """Truncating a valid CRAM AVI at any byte must either decode the
    prefix that survives intact or raise a clean ValueError /
    NotImplementedError — never hang, never return malformed frames."""
    from osm_pg_etl_spark.functions.avicodec import (decode_avi,
                                                     encode_avi_msvc)

    frames = []
    for f in range(nframes):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[0:4, 0:4] = (f * 8) % 248
        frames.append(img)
    avi = encode_avi_msvc(frames)
    payload = avi[:min(cut, len(avi))]
    try:
        dec, _ = decode_avi(payload)
    except (ValueError, NotImplementedError):
        return
    for d in dec:
        assert d.shape == (8, 8, 3) and d.dtype == np.uint8


@given(st.integers(0, 600))
@settings(max_examples=120, deadline=None)
def test_tiff_jpeg_truncation_raises_cleanly(cut):
    """Truncated JPEG-in-TIFF payloads raise ValueError (or decode an
    intact prefix) — the IFD walk and strip splice never read out of
    bounds silently."""
    from osm_pg_etl_spark.functions.tiffcodec import (decode_tiff,
                                                      encode_tiff_jpeg)

    img = np.full((16, 16, 3), 100, dtype=np.uint8)
    t = encode_tiff_jpeg(img, quant=np.ones((8, 8)), rows_per_strip=8,
                         use_jpeg_tables=True)
    payload = t[:min(cut, len(t))]
    try:
        pages = decode_tiff(payload)
    except (ValueError, NotImplementedError):
        return
    assert pages and pages[0].shape == (16, 16, 3)
