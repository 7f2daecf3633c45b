"""Topological way-splitting — the reference's crown jewel
(``osm-road-graphs.sql:64-165``, generic form ``osm-road-graphs-fix.sql:17-75,
134-182``; SURVEY §2.3 J7-J10, §2.4 A7-A10, §2.5 W1).

OSM ways do not break at intersections; the pipeline reconstructs proper
graph edges by splitting each way at nodes shared with other ways
("Approach 2" in the reference — ``osm-road-graphs-fix.sql:14``: "Node based
reconstruction is topological and therefore more precise and robust"). This
is the approach that scales: it is pure joins/windows/aggregations with no
spatial machinery, unlike the O(n²) geometric split the reference itself
flags as "Does not work with large maps" (``osm-road-graphs-fix.sql:91``).

Stages (names mirror the reference's ``topology_summary.*`` IR tables):

1. ``shared_nodes``    — node ids used more than once among network ways
                         (``osm-road-graphs.sql:66-76``, J9). Occurrence
                         count, not distinct ways: a closed ring's repeated
                         endpoint counts twice, exactly as in the reference.
2. ``ways_length``     — per-way max sequence_id and its node, via
                         ``max_by`` instead of DISTINCT ON (A10). The
                         reference's ``sequence_id > 1`` filter is kept:
                         2-node ways have no length row and are never split.
3. ``ways_split_nodes``— interior shared nodes (0 < seq < length) (J2/J3).
4. ``ways_merge_limits``— per-way segment boundaries: lag window over the
                         shared-node positions (W1) + dead-end closing
                         segments (J10).
5. ``nodes_to_merge``  — way_nodes × limits range join (J7): equi on way_id
                         with a BETWEEN residual, so Catalyst plans a normal
                         hash/SMJ join; per-way limit lists are tiny.
6. ``merged_network``  — segment reassembly + attribute backfill + anti-join
                         append of untouched ways (A7/A8, J6, J4).

Scale notes: every stage shuffles on ``way_id`` or ``node_id`` only; AQE
handles the mild skew (a handful of mega-ways). The fast assembly path
avoids the way_nodes×nodes join entirely by slicing each way's own
``nodes``/``linestring`` arrays — segment extraction becomes a narrow
operation co-located with the way row, which at 100 TB removes the single
biggest shuffle of the reference pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import array_first, array_last
from ..functions.geo import linestring_length_km

# attribute columns carried through the split by default (the car-network
# set, osm-road-graphs.sql:149-159); complete_network_merged passes the wider
# mode-flag set (osm-complete-graphs-fix.sql:167-188)
DEFAULT_MERGE_ATTRS = ("speed_limit", "highway", "oneway")

MERGED_COLUMNS = ("start_node", "end_node", "edge_id", "tags", "nodes",
                  "length", "speed_limit", "highway", "oneway", "geom")


def _merged_columns(attrs: tuple[str, ...]) -> tuple[str, ...]:
    return ("start_node", "end_node", "edge_id", "tags", "nodes",
            "length", *attrs, "geom")


def unnest_way_nodes(ways: DataFrame) -> DataFrame:
    """``unnest_bbox_way_nodes`` (U6, ``etl/pgsnapshot_schema_0.6.sql:
    122-136``): the plpgsql loop that unnests ``ways.nodes`` into
    (way_id, node_id, sequence_id) rows is a single posexplode."""
    return ways.select(
        F.col("id").alias("way_id"),
        F.posexplode("nodes").alias("sequence_id", "node_id"),
    ).select("way_id", "node_id", F.col("sequence_id").cast("int").alias("sequence_id"))


def network_way_nodes(way_nodes: DataFrame, network: DataFrame) -> DataFrame:
    """way_nodes restricted to network ways — the ``way_id IN (SELECT
    edge_id ...)`` semi-join used by every stage (``osm-road-graphs.sql:72,
    82,91``). Computed once and cached by the pipeline driver."""
    ids = network.select(F.col("edge_id").alias("way_id"))
    return way_nodes.join(ids, "way_id", "left_semi")


def shared_nodes(wn_net: DataFrame) -> DataFrame:
    """``topology_summary.ways_shared_nodes`` (``osm-road-graphs.sql:66-76``)."""
    return (wn_net.groupBy("node_id")
            .agg(F.count(F.lit(1)).alias("count"))
            .filter(F.col("count") > 1))


def ways_length(wn_net: DataFrame) -> DataFrame:
    """``topology_summary.ways_length`` (``osm-road-graphs.sql:78-85``):
    DISTINCT ON (way_id) ... ORDER BY sequence_id DESC ≡ max_by. The
    ``sequence_id > 1`` filter is reference-observable behavior (2-node ways
    drop out) and is preserved."""
    f = wn_net.filter(F.col("sequence_id") > 1)
    return f.groupBy("way_id").agg(
        F.max("sequence_id").alias("length"),
        F.max_by("node_id", "sequence_id").alias("node_id"))


def ways_split_nodes(wn_net: DataFrame, shared: DataFrame,
                     lengths: DataFrame) -> DataFrame:
    """``topology_summary.ways_split_nodes`` (``osm-road-graphs.sql:87-95``):
    shared nodes strictly interior to a way. The correlated EXISTS with the
    ``sequence_id < length`` inequality decorrelates to an equi-join on
    way_id (unique) + filter."""
    return (wn_net.filter(F.col("sequence_id") > 0)
            .join(shared.select("node_id"), "node_id", "left_semi")
            .join(lengths.select("way_id", "length"), "way_id", "inner")
            .filter(F.col("sequence_id") < F.col("length"))
            .select("way_id", "node_id", "sequence_id"))


def ways_merge_limits(wn_net: DataFrame, shared: DataFrame,
                      split_nodes: DataFrame, lengths: DataFrame) -> DataFrame:
    """``topology_summary.ways_merge_limits`` (``osm-road-graphs.sql:97-115``):
    for each way that has a split node, the [bottom, top] sequence ranges of
    its segments. Boundaries are *all* shared-node positions with seq > 0
    (including a shared final node), bottom = lag(seq, 1, default 0); then a
    closing segment is appended for dead-end tails (top-1 boundary < way
    length)."""
    w = Window.partitionBy("way_id").orderBy("sequence_id")
    base = (wn_net.filter(F.col("sequence_id") > 0)
            .join(split_nodes.select("way_id").distinct(), "way_id", "left_semi")
            .join(shared.select("node_id"), "node_id", "left_semi")
            .select("way_id",
                    F.lag("sequence_id", 1, 0).over(w).alias("bottom_limit"),
                    F.col("sequence_id").alias("top_limit")))
    # Dead ends (osm-road-graphs.sql:106-115): DISTINCT ON max top_limit per
    # way, joined to way length, appended when it falls short.
    last = base.groupBy("way_id").agg(F.max("top_limit").alias("bottom_limit"))
    tail = (last.join(lengths.select("way_id", "length"), "way_id", "inner")
            .filter(F.col("bottom_limit") < F.col("length"))
            .select("way_id", "bottom_limit", F.col("length").alias("top_limit")))
    return base.unionByName(tail)


def nodes_to_merge(wn_net: DataFrame, limits: DataFrame) -> DataFrame:
    """``topology_summary.nodes_to_merge`` (``osm-road-graphs.sql:119-127``):
    assign every way_node row to its segment(s). Range join (J7): equi on
    way_id + BETWEEN residual. Boundary nodes fall in two ranges and are
    correctly duplicated (segment N's end is segment N+1's start)."""
    return (wn_net.join(limits, "way_id", "inner")
            .filter((F.col("sequence_id") >= F.col("bottom_limit"))
                    & (F.col("sequence_id") <= F.col("top_limit")))
            .select("way_id", F.col("top_limit").alias("group_id"),
                    "sequence_id", "node_id"))


def _assemble_from_way_arrays(limits: DataFrame, network: DataFrame,
                              attrs: tuple[str, ...] = DEFAULT_MERGE_ATTRS) -> DataFrame:
    """Fast segment assembly: because segment ranges are contiguous in
    sequence order and ``ways.nodes``/``linestring`` are already ordered by
    sequence_id, segment node lists and geometries are array *slices* of the
    parent way's own columns — no way_nodes×nodes join, no collect_list.
    Equivalent to the reference's group-by reassembly
    (``osm-road-graphs.sql:143-148``); proven against the general path in
    tests/test_topology.py.

    Single pass over ``network``: the per-way limit list is aggregated small
    (segments per way), left-joined once, and ways without limits fall back
    to one whole-way range — this fuses the reference's INSERT + UPDATE
    backfill + anti-join append (``osm-road-graphs.sql:143-165``) into one
    join, so the (huge) ways table is scanned exactly once."""
    lim_lists = limits.groupBy("way_id").agg(
        F.collect_list(F.struct(
            F.col("bottom_limit").cast("int").alias("bottom_limit"),
            F.col("top_limit").cast("int").alias("top_limit"))).alias("_lims"))
    whole_way = F.array(F.struct(
        F.lit(0).cast("int").alias("bottom_limit"),
        (F.size("nodes") - 1).cast("int").alias("top_limit")))
    seg_len = F.col("_lim.top_limit") - F.col("_lim.bottom_limit") + 1
    return (network
            .join(lim_lists, network["edge_id"] == lim_lists["way_id"], "left")
            .withColumn("_lim", F.explode(F.coalesce("_lims", whole_way)))
            .select(
                network["edge_id"],
                F.col("_lim.top_limit").alias("group_id"),
                F.slice(network["nodes"], F.col("_lim.bottom_limit") + 1,
                        seg_len).alias("nodes"),
                F.slice(network["geom"], F.col("_lim.bottom_limit") + 1,
                        seg_len).alias("geom"),
                network["tags"], *[network[a] for a in attrs],
            ))


def _assemble_from_nodes(merge_rows: DataFrame, nodes: DataFrame,
                         broadcast_rows: bool = False) -> DataFrame:
    """General segment assembly (``osm-road-graphs.sql:143-148``): join the
    per-segment node rows to the nodes table for coordinates, then rebuild
    ordered arrays with sort_array(collect_list(struct(seq, ...))) — the
    deterministic replacement for ``array_agg(... ORDER BY sequence_id)``
    (SURVEY §2.4 A7/A8).

    ``broadcast_rows=True`` hints ``merge_rows`` as the broadcast side of
    the coordinate join: the incremental path passes blast-radius-sized
    merge rows against a planet-sized nodes table, and the hint turns the
    nodes side's full shuffle into a stationary scan (guide §3.1 — the
    big side is not shuffled at all; an inner join is side-symmetric so
    the result is unchanged). Leave it off when merge_rows is the full
    corpus (the general full-rebuild path)."""
    rows = F.broadcast(merge_rows) if broadcast_rows else merge_rows
    pts = rows.join(
        nodes.select(F.col("id").alias("node_id"), "lon", "lat"),
        "node_id", "inner")
    collected = (pts.groupBy(F.col("way_id").alias("edge_id"), "group_id")
                 .agg(F.sort_array(F.collect_list(F.struct(
                     F.col("sequence_id").alias("seq"),
                     F.col("node_id").alias("node_id"),
                     F.struct(F.col("lon").alias("lon"),
                              F.col("lat").alias("lat")).alias("pt"),
                 ))).alias("s")))
    return collected.select(
        "edge_id", "group_id",
        F.transform("s", lambda r: r["node_id"]).alias("nodes"),
        F.transform("s", lambda r: r["pt"]).alias("geom"))


def merged_network(network: DataFrame, way_nodes: DataFrame,
                   nodes: DataFrame | None = None,
                   use_array_fast_path: bool = True,
                   attrs: tuple[str, ...] = DEFAULT_MERGE_ATTRS,
                   pre_partitioned: bool = False,
                   shared_override: DataFrame | None = None) -> DataFrame:
    """``graphs.car_network_merged`` (``osm-road-graphs.sql:129-165``): the
    split-and-reassembled edge table.

    - Segment rows get attributes from the parent way via an equi-join on
      edge_id (the UPDATE…FROM backfill at ``:149-159``), with start/end
      promoted from the new node arrays and geodesic-km length.
    - Ways with no split pass through unchanged via an anti-join append
      (``:161-165``).
    - ``attrs`` selects which parent-way columns ride through the split;
      the complete-network variant passes the mode-flag set
      (service/access/car/pedestrian/bicycle,
      ``osm-complete-graphs-fix.sql:167-188``).

    Contract shared by both assembly paths: the ``nodes`` table must cover
    every id in ``ways.nodes``. The fast path slices the way's own arrays
    (missing node ids are kept verbatim); the general path inner-joins the
    nodes table and would drop them — on truncated OSM extracts, pre-filter
    ways to those fully inside the extract before splitting.
    """
    # hash-partition by way_id BEFORE caching: the cached partitioning is
    # reused by every way_id-keyed stage downstream (length agg, limits
    # window, assembly groupBy), collapsing their per-stage shuffles into
    # this one exchange — the Spark analog of the reference clustering its
    # IR tables (CLUSTER, pgsnapshot_schema_0.6.sql:112-116).
    # pre_partitioned=True skips even that exchange: pass it when way_nodes
    # comes from a table bucketed by way_id (sources.io.write_bucketed) —
    # the bucket scan's HashPartitioning(way_id) already satisfies every
    # way_id-keyed stage, so the pipeline runs with zero way_id shuffles.
    # shared_override: callers that re-split only a SUBSET of ways (the
    # incremental path) must supply the GLOBAL shared-node table — shared
    # status depends on every network way using a node, and recomputing
    # it from the subset's wn would miss cross-way sharing. The override
    # flows through the same semi-joins as the locally-computed table.
    wn_net = network_way_nodes(way_nodes, network)
    if not pre_partitioned:
        wn_net = wn_net.repartition("way_id")
    wn_net = wn_net.cache()
    shared = shared_nodes(wn_net) if shared_override is None \
        else shared_override
    lengths = ways_length(wn_net).cache()
    splits = ways_split_nodes(wn_net, shared, lengths)
    limits = ways_merge_limits(wn_net, shared, splits, lengths)

    out_cols = _merged_columns(attrs)
    if use_array_fast_path:
        # one scan of network; untouched ways fall through as a whole-way
        # slice (identical nodes/geom/length to the original row)
        segs = _assemble_from_way_arrays(limits, network, attrs)
        return segs.select(
            array_first("nodes").alias("start_node"),
            array_last("nodes").alias("end_node"),
            "edge_id", "tags", "nodes",
            linestring_length_km("geom").alias("length"),
            *attrs, "geom")

    if nodes is None:
        raise ValueError("general assembly path requires the nodes table")
    segs = _assemble_from_nodes(nodes_to_merge(wn_net, limits), nodes)
    attr_tbl = network.select("edge_id", "tags", *attrs)
    merged = (segs.join(attr_tbl, "edge_id", "inner")
              .select(
                  array_first("nodes").alias("start_node"),
                  array_last("nodes").alias("end_node"),
                  "edge_id", "tags", "nodes",
                  linestring_length_km("geom").alias("length"),
                  *attrs, "geom"))

    untouched = (network
                 .join(segs.select("edge_id").distinct(), "edge_id", "left_anti")
                 .select(*out_cols))
    return merged.select(*out_cols).unionByName(untouched)


def merged_network_incremental(old_network: DataFrame,
                               old_way_nodes: DataFrame,
                               old_merged: DataFrame,
                               new_network: DataFrame,
                               new_way_nodes: DataFrame,
                               changed_way_ids: DataFrame,
                               attrs: tuple[str, ...] = DEFAULT_MERGE_ATTRS,
                               old_node_counts: DataFrame | None = None,
                               return_affected: bool = False,
                               nodes: DataFrame | None = None):
    """Incremental maintenance of the merged network under a way-level
    change batch — the ``osmosisUpdate()`` scenario (apply a minutely
    diff, refresh the derived road graph; ``etl/pgsnapshot_schema_0.6.
    sql:139-143``) without re-splitting the whole planet: at 100 TB the
    full topology pipeline over an unchanged continent to absorb a
    thousand-way diff is the dominant waste, and this touches only the
    blast radius of the batch.

    Exact dependency analysis: a way's segments depend on (a) its own
    node list and attributes, and (b) the SHARED status (used by ≥ 2
    network-way occurrences) of each of its interior nodes. A change
    batch therefore invalidates exactly: the changed ways, plus every
    way using a node whose shared status FLIPPED. Node-use counts are
    maintained incrementally — delta = counts over the changed ways'
    new rows minus counts over their old rows, touching only those
    nodes; unchanged ways never rescan. The affected subset is re-split
    by the ordinary :func:`merged_network` with the updated GLOBAL
    shared table injected (``shared_override`` — recomputing shared
    from the subset alone would miss cross-way sharing), and the result
    is ``old_merged`` minus affected segments plus the recomputation:
    segments of unaffected ways are byte-identical to a full rebuild
    because their inputs (own rows + shared status of their nodes) are
    untouched — the property gate ``osm_merged_incremental``
    hash-checks against a full-recompute oracle.

    ``changed_way_ids`` is a (way_id) DataFrame covering every created,
    modified, or deleted way in the batch (at the RAW-way level — a tag
    edit that moves a way in or out of the network filter counts).
    ``old_merged`` is the previously-materialized merged table (the IVM
    state, alongside the old inputs), and ``old_node_counts`` the
    maintained (node_id, count) table of network-way-node occurrences —
    pass it to keep the maintenance step free of any full-table
    aggregation (it is recomputed from the old inputs when omitted,
    which is correct but pays one old-table scan). Cost with state
    supplied: the changed ways' rows, one node-keyed count merge over
    touched nodes, one broadcast-semi scan of the new way_nodes for
    flip membership (narrow — no shuffle; an inverted node→way index
    turns even that into a lookup), and the split/merge pipeline over
    the affected subset only.

    ``nodes``: pass the nodes table to assemble the affected subset's
    segment arrays from (way_nodes ∩ affected) ⋈ nodes — the general
    assembly path — instead of slicing ``new_network``'s own
    nodes/geom arrays. ``new_network`` then only needs
    (edge_id, tags, *attrs): at 100 TB this removes the LAST
    full-corpus array assembly from the IVM path (maintaining a
    planet-wide ways-with-arrays snapshot per batch just so ~0.01 % of
    it can be sliced), leaving only per-table maintained state plus
    blast-radius work. Contract inherited from the general path: the
    nodes table must cover every node id of the affected ways, and
    every affected network way must have way_nodes rows (both hold
    whenever way_nodes/nodes are the consistent post-batch snapshot —
    node ids are foreign keys); segment values are identical to the
    fast path's because sequence_id is the dense array position and
    the way arrays were themselves assembled from the same nodes
    table (pinned by test_incremental_nodes_path_equals_arrays_path).
    """
    ch = changed_way_ids.select("way_id").distinct()
    # new_wn is read three times (the batch's new-row counts, the
    # flipped-node membership scan, and the affected-subset way_nodes
    # below); without the cache every reference re-derives
    # new_way_nodes — from the gate that is a full way-assembly +
    # posexplode per reference (guide §5: materialize multi-consumer
    # intermediates once)
    new_wn = network_way_nodes(new_way_nodes, new_network).cache()
    # restrict to the changed ways FIRST so the network semi-join and
    # count aggregation below touch only the batch's rows
    old_ch = network_way_nodes(
        old_way_nodes.join(ch, "way_id", "left_semi"), old_network)
    new_ch = new_wn.join(ch, "way_id", "left_semi")

    old_counts = old_node_counts
    if old_counts is None:
        # maintained state in production; derived here from old inputs
        old_counts = (network_way_nodes(old_way_nodes, old_network)
                      .groupBy("node_id")
                      .agg(F.count(F.lit(1)).alias("count")))
    delta = (new_ch.groupBy("node_id").agg(F.count(F.lit(1)).alias("_d"))
             .unionByName(old_ch.groupBy("node_id")
                          .agg((-F.count(F.lit(1))).alias("_d")))
             .groupBy("node_id").agg(F.sum("_d").alias("_d")))
    # ONE old⋈delta count merge, cached: its two readers (new_shared
    # below, flipped) would otherwise each re-execute the old_counts
    # aggregation — a full way_nodes pass per reader when the maintained
    # state isn't supplied (guide §5: materialize multi-consumer
    # intermediates once; r15 follow-up to the new_wn cache above)
    merged_counts = (old_counts.join(delta, "node_id", "full")
                     .select("node_id",
                             F.coalesce("count", F.lit(0)).alias("_oc"),
                             (F.coalesce("count", F.lit(0))
                              + F.coalesce("_d", F.lit(0))).alias("_nc"))
                     .cache())
    new_shared = (merged_counts.filter(F.col("_nc") > 1)
                  .select("node_id", F.col("_nc").alias("count")))
    flipped = (merged_counts
               .filter((F.col("_oc") > 1) != (F.col("_nc") > 1))
               .select("node_id"))

    # affected is tiny (the blast radius' way ids) but read THREE times
    # (sub_net, sub_wn, the kept anti-join) — without the cache each
    # reader re-runs the flipped-membership scan over new_wn
    affected = (ch.unionByName(
        new_wn.join(flipped, "node_id", "left_semi")
        .select("way_id")).distinct().cache())

    sub_net = new_network.join(
        affected.select(F.col("way_id").alias("edge_id")),
        "edge_id", "left_semi")
    # way_nodes for the re-split subset, read from the cached network-
    # restricted table rather than raw new_way_nodes: identical input to
    # merged_network because its own network_way_nodes(sub_wn, sub_net)
    # re-restricts to sub_net's ways, and sub_net ⊆ new_network — the
    # network restriction is idempotent, so pre-restricted rows are the
    # same rows (network_way_nodes is a left-semi join that keeps the
    # way_nodes schema unchanged)
    sub_wn = new_wn.join(affected, "way_id", "left_semi")
    if nodes is None:
        recomputed = merged_network(sub_net, sub_wn, attrs=attrs,
                                    shared_override=new_shared)
    else:
        recomputed = _assemble_affected_from_nodes(sub_net, sub_wn,
                                                   new_shared, nodes, attrs)
    kept = old_merged.join(
        affected.select(F.col("way_id").alias("edge_id")),
        "edge_id", "left_anti")
    # old_merged may be the geometry-free meta projection of the merged
    # table (n_nodes in place of the nodes/geom arrays — what
    # _shared_network caches); align the recomputed side by computing
    # the same size. Any other column mismatch still fails loudly.
    rec_cols = [F.size("nodes").alias("n_nodes")
                if c == "n_nodes" and "n_nodes" not in recomputed.columns
                else F.col(c)
                for c in kept.columns]
    out = kept.unionByName(recomputed.select(*rec_cols))
    # return_affected: the blast-radius table, for telemetry — the
    # fraction of ways re-split IS the scale claim (wall clock on a
    # local job floor is barrier-bound either way)
    return (out, affected) if return_affected else out


def _assemble_affected_from_nodes(sub_net: DataFrame, sub_wn: DataFrame,
                                  shared: DataFrame, nodes: DataFrame,
                                  attrs: tuple[str, ...]) -> DataFrame:
    """Re-split the affected subset via the general assembly path, reading
    arrays from nowhere: the split chain (shared→splits→limits) runs on
    ``sub_wn`` exactly as :func:`merged_network` would run it on
    ``network_way_nodes(sub_wn, sub_net)`` (identical — ``sub_wn``'s ways
    are already restricted to ``sub_net``'s, see
    test_network_restricted_sub_wn_identical), ways without a split row
    get an explicit whole-way [0, max seq] range (the general path's
    anti-join passthrough, expressed without touching ``new_network``
    arrays; max sequence_id = len(nodes)-1 because sequence ids are the
    dense array positions), and one :func:`_assemble_from_nodes` pass
    rebuilds every affected segment from the nodes table."""
    wn_net = sub_wn.repartition("way_id").cache()
    lengths = ways_length(wn_net).cache()
    splits = ways_split_nodes(wn_net, shared, lengths)
    limits = ways_merge_limits(wn_net, shared, splits, lengths)
    whole = (wn_net.groupBy("way_id")
             .agg(F.max("sequence_id").alias("top_limit"))
             .join(limits.select("way_id").distinct(), "way_id", "left_anti")
             .select("way_id", F.lit(0).cast("int").alias("bottom_limit"),
                     F.col("top_limit").cast("int")))
    segs = _assemble_from_nodes(
        nodes_to_merge(wn_net, limits.unionByName(whole)), nodes,
        broadcast_rows=True)
    attr_tbl = sub_net.select("edge_id", "tags", *attrs)
    return (segs.join(attr_tbl, "edge_id", "inner")
            .select(array_first("nodes").alias("start_node"),
                    array_last("nodes").alias("end_node"),
                    "edge_id", "tags", "nodes",
                    linestring_length_km("geom").alias("length"),
                    *attrs, "geom"))
