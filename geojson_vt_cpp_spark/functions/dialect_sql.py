"""Dual-dialect SQL templates: each query renders to Spark SQL (executed by
the engine via ``spark.sql`` — fully Catalyst-planned) and to DuckDB SQL (the
independent correctness oracle). One template per query guarantees formula
identity; the only dialect differences are hex->bigint casts, lateral
explode syntax, and list indexing.

Cross-engine determinism rules used throughout:

- integer/string outputs wherever possible;
- float aggregates go through exact DECIMAL sums, cast back to double;
- portable 60-bit hash = first 15 hex chars of md5 (verified bit-identical:
  Spark ``conv(substring(md5(s),1,15),16,10)`` == DuckDB
  ``('0x'||substr(md5(s),1,15))::BIGINT``);
- synthetic geometry/points are pure integer arithmetic over table keys
  (no transcendentals — libm differs across engines);
- unavoidable float math (cosine) is rounded to 6 dp with id tie-breaks.
"""

from __future__ import annotations

from geojson_vt_cpp_spark.functions.cells import cell_id_sql

MAX_DOC_CHARS = 4096  # documents.n_chars upper bound for DuckDB series


def hexhash(s: str, dialect: str) -> str:
    """Portable 60-bit hash of a string expression."""
    if dialect == "spark":
        return f"cast(conv(substring(md5({s}),1,15),16,10) as bigint)"
    return f"(('0x' || substr(md5({s}),1,15))::BIGINT)"


def to_str(e: str, dialect: str) -> str:
    return f"cast({e} as string)" if dialect == "spark" else f"cast({e} as varchar)"


def occurrences(text: str, marker: str, dialect: str) -> str:
    """Occurrence count via the replace-length identity (no regex — regex
    semantics diverge across engines)."""
    return (
        f"cast((length({text}) - length(replace({text}, '{marker}', '')))"
        f" / {len(marker)} as int)"
    )


# synthetic unit-square points from integer keys (exact in both engines)
def synth_px(key: str) -> str:
    # cast-to-double divisor: Spark parses a bare `99991.0` literal as
    # DECIMAL and the whole expression tree silently goes decimal
    return f"((({key}) * 2654435761) % 99991) / cast(99991 as double)"


def synth_py(key: str) -> str:
    return f"((({key}) * 2246822519) % 99989) / cast(99989 as double)"


def _shingles_from(dialect: str, table: str = "documents", n: int = 8) -> str:
    """FROM clause producing (doc_id, shingle) char n-grams."""
    if dialect == "spark":
        return (
            f"from {table} lateral view explode(sequence(1, greatest(length(text)-{n-1},1))) t as i"
        )
    return (
        f"from {table} cross join generate_series(1, {MAX_DOC_CHARS}) as g(i) "
        f"where g.i <= greatest(length(text)-{n-1}, 1)"
    )


def _words_from(dialect: str, table: str = "documents") -> str:
    if dialect == "spark":
        return f"from {table} lateral view explode(split(text, ' ')) t as w"
    return f"from (select doc_id, unnest(string_split(text, ' ')) as w from {table})"


def _bits_join(dialect: str, lo: int, hi: int, alias: str = "b") -> str:
    if dialect == "spark":
        return f"lateral view explode(sequence({lo}, {hi})) bt as {alias}"
    return f"cross join generate_series({lo}, {hi}) as bt({alias})"


def _vec_elems(dialect: str, table: str = "embeddings") -> str:
    """(vec_id, i 1-based, x double) from the embeddings list column."""
    if dialect == "spark":
        return (
            f"select vec_id, pos + 1 as i, cast(col as double) as x "
            f"from {table} lateral view posexplode(embedding) as pos, col"
        )
    return (
        f"select vec_id, g.i as i, cast(embedding[g.i] as double) as x "
        f"from {table} cross join generate_series(1, 64) as g(i)"
    )


def last_ignore_nulls(e: str, dialect: str) -> str:
    """Carry-forward window aggregate (the as-of join primitive)."""
    if dialect == "spark":
        return f"last({e}, true)"
    return f"last_value({e} ignore nulls)"


def cosine_scores_sql(dialect: str, table: str = "embeddings") -> str:
    """(vec_id, cosine) of every vector vs the query vector (vec_id=0),
    rounded to 6 dp — the shared score formula for both the windowed oracle
    (sim_cosine_topk) and the engine's distributed top-k operator."""
    elems = _vec_elems(dialect, table)
    return " ".join(
        f"""
        with e as ({elems}),
        qv as (select i, x as qx from e where vec_id = 0),
        dots as (
          select e.vec_id,
                 sum(e.x * qv.qx) as dot,
                 sum(e.x * e.x) as nx,
                 sum(qv.qx * qv.qx) as nq
          from e join qv on e.i = qv.i
          group by e.vec_id
        )
        select vec_id, round(dot / (sqrt(nx) * sqrt(nq)), 6) as cosine
        from dots where vec_id <> 0
    """.split()
    )


def minhash_jaccard_sql(dialect: str) -> str:
    """Minhash LSH candidate pairs refined by EXACT char-4-gram Jaccard —
    the chained pairs -> refine query. The Spark ENGINE runs
    ``operators.dedup.jaccard_refine`` (per-doc gram arrays +
    whole-stage-codegen array_intersect, no per-pair gram shuffle); this
    template is the declarative twin, used as the DuckDB oracle and for
    cross-dialect tests. Zero-overlap candidate pairs keep their row
    (jaccard = 0) via the left join, matching the operator."""
    d = dialect
    pairs_q = queries_sql(d)["dedup_minhash_pairs"]
    return f"""
        with pairs as ({pairs_q}),
        grams as (
          select distinct doc_id, substr(text, i, 4) as g {_shingles_from(d, n=4)}
        ),
        sizes as (select doc_id, count(*) as n from grams group by doc_id),
        inter as (
          select p.doc_a, p.doc_b, count(*) as n_inter
          from pairs p
          join grams ga on ga.doc_id = p.doc_a
          join grams gb on gb.doc_id = p.doc_b and gb.g = ga.g
          group by p.doc_a, p.doc_b
        )
        select p.doc_a, p.doc_b,
               cast(coalesce(i.n_inter, 0) as bigint) as n_inter,
               cast(coalesce(sa.n, 0) as bigint) as n_a,
               cast(coalesce(sb.n, 0) as bigint) as n_b,
               case when coalesce(sa.n, 0) + coalesce(sb.n, 0)
                         - coalesce(i.n_inter, 0) > 0
                    then round(cast(coalesce(i.n_inter, 0) as double)
                               / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                                  - coalesce(i.n_inter, 0)), 6)
                    else cast(0.0 as double) end as jaccard
        from pairs p
        left join inter i on i.doc_a = p.doc_a and i.doc_b = p.doc_b
        left join sizes sa on sa.doc_id = p.doc_a
        left join sizes sb on sb.doc_id = p.doc_b
    """


def queries_sql(dialect: str) -> dict[str, str]:
    """All dual-dialect queries, keyed like __spark_entry__.queries()."""
    d = dialect
    hh = lambda s: hexhash(s, d)
    ts = lambda e: to_str(e, d)
    q: dict[str, str] = {}

    # ---- relational anchors -------------------------------------------------
    q["rel_lineitem_pricing"] = f"""
        select l_returnflag, l_linestatus,
               cast(sum(cast(l_quantity as decimal(20,2))) as double) as sum_qty,
               cast(sum(cast(l_extendedprice as decimal(20,2))) as double) as sum_base_price,
               cast(sum(cast(l_extendedprice as decimal(20,2)) * cast(1 - l_discount as decimal(20,2))) as double) as sum_disc_price,
               count(*) as count_order
        from lineitem
        where l_shipdate <= timestamp '1998-09-01 00:00:00'
        group by l_returnflag, l_linestatus
    """

    q["rel_top_customer_revenue"] = f"""
        select c.c_custkey, c.c_name,
               cast(sum(cast(o.o_totalprice as decimal(20,2))) as double) as revenue,
               count(*) as n_orders
        from orders o join customer c on o.o_custkey = c.c_custkey
        group by c.c_custkey, c.c_name
        having count(*) >= 12
    """

    q["rel_events_hourly"] = f"""
        select event_type,
               {"date_format(ts, 'yyyy-MM-dd HH')" if d == 'spark' else "strftime(ts, '%Y-%m-%d %H')"} as hour_bucket,
               count(*) as n_events,
               cast(sum(cast(value as decimal(20,4))) as double) as sum_value
        from events
        group by 1, 2
        having count(*) > 2
    """

    q["rel_region_rollup"] = f"""
        select r.r_name, n.n_name,
               count(distinct c.c_custkey) as n_customers,
               cast(sum(cast(c.c_acctbal as decimal(20,2))) as double) as sum_acctbal
        from region r
        join nation n on n.n_regionkey = r.r_regionkey
        join customer c on c.c_nationkey = n.n_nationkey
        group by r.r_name, n.n_name
    """

    q["rel_order_rank_window"] = f"""
        with ranked as (
          select o_orderpriority, o_orderkey, o_totalprice,
                 row_number() over (partition by o_orderpriority
                                    order by o_totalprice desc, o_orderkey asc) as rnk
          from orders)
        select o_orderpriority, rnk, o_orderkey,
               cast(cast(o_totalprice as decimal(20,2)) as double) as o_totalprice
        from ranked where rnk <= 5
    """

    q["rel_part_semijoin"] = f"""
        select p.p_brand, count(*) as n_parts
        from part p
        where exists (
          select 1 from lineitem l
          where l.l_partkey = p.p_partkey and l.l_quantity > 45
        )
        group by p.p_brand
    """

    q["rel_events_sessions"] = f"""
        with t as (
          select user_id, event_type, ts,
                 lag(ts) over (partition by user_id order by ts, event_id) as prev_ts
          from events)
        select user_id, count(*) as n_events,
               cast(sum(case when prev_ts is null
                        or {"timestampdiff(MICROSECOND, prev_ts, ts)" if d == 'spark' else "date_diff('microsecond', prev_ts, ts)"} > 1800000000
                   then 1 else 0 end) as bigint) as n_sessions
        from t group by user_id
    """

    # as-of join: each purchase matched to its user's most recent click AT
    # OR BEFORE it (side 0 sorts before side 1 at equal ts). The
    # carry-forward window is partitioned per user — keyed state only, the
    # scale-safe as-of formulation (no range join, no broadcast)
    q["rel_events_asof"] = f"""
        with tagged as (
          select user_id, ts, event_id, value, 0 as side
          from events where event_type = 'click'
          union all
          select user_id, ts, event_id, cast(null as double) as value, 1 as side
          from events where event_type = 'purchase'
        ),
        m as (
          select user_id, ts, event_id, side,
                 {last_ignore_nulls('value', d)} over (
                   partition by user_id
                   order by ts asc, side asc, event_id asc
                   rows between unbounded preceding and current row
                 ) as asof_click_value
          from tagged
        )
        select cast(event_id as bigint) as purchase_id,
               cast(user_id as bigint) as user_id,
               cast(asof_click_value as double) as asof_click_value
        from m where side = 1
    """

    # hypertable-style multi-grain rollup: one scan, GROUPING SETS over
    # hour/day/week buckets — partial aggregation combines map-side once
    # and fans into every grain (the continuous-aggregate shape)
    def fmt_bucket(trunc_part: str, out_fmt_spark: str, out_fmt_duck: str) -> str:
        # explicit string formatting: DuckDB's date_trunc returns DATE for
        # day-or-coarser parts, so casts alone don't format identically
        if d == "spark":
            return f"date_format(date_trunc('{trunc_part}', ts), '{out_fmt_spark}')"
        return f"strftime(date_trunc('{trunc_part}', ts), '{out_fmt_duck}')"

    q["rel_events_rollup_multires"] = f"""
        select
          case when grouping(h) = 0 then 'hour'
               when grouping(dy) = 0 then 'day' else 'week' end as grain,
          coalesce(h, dy, wk) as bucket,
          event_type,
          count(*) as n_events,
          cast(sum(cast(value as decimal(20,4))) as double) as sum_value
        from (
          select event_type, value,
                 {fmt_bucket('hour', 'yyyy-MM-dd HH', '%Y-%m-%d %H')} as h,
                 {fmt_bucket('day', 'yyyy-MM-dd', '%Y-%m-%d')} as dy,
                 {fmt_bucket('week', 'yyyy-MM-dd', '%Y-%m-%d')} as wk
          from events
        ) t
        group by event_type, grouping sets ((h), (dy), (wk))
    """

    # KMV (k minimum values) distinct-count sketch — a DETERMINISTIC sketch
    # both engines compute bit-identically (portable md5-derived hashes), so
    # the ESTIMATE itself is oracle-checkable, unlike engine-native HLLs.
    # Scale shape: the exact-distinct pre-aggregation is a hash groupBy
    # (map-side combine). In the SPARK dialect the k-min is TWO-LEVEL: a
    # salted bucket-local top-k (h % 16 buckets) feeds a per-group top-k
    # over <= 16k survivors — no single task ever sees a whole group's
    # distinct users. Exactness is a property, not an approximation: the
    # global k minima all survive bucket-local top-k, so both dialects
    # produce identical rows (DuckDB keeps the one-level form as the
    # independent oracle).
    kmv_h = hh(f"concat('kmv-', {ts('user_id')})")
    if d == "spark":
        kmv_prune = """
        pre as (
          select event_type, h,
                 row_number() over (partition by event_type, h % 16
                                    order by h asc) as prn
          from hashed0
        ),
        hashed as (select event_type, h from pre where prn <= 64),
        """
    else:
        kmv_prune = "hashed as (select event_type, h from hashed0),"
    q["sketch_kmv_distinct"] = f"""
        with du as (select distinct event_type, user_id from events),
        hashed0 as (select event_type, {kmv_h} as h from du),
        {kmv_prune}
        ranked as (
          select event_type, h,
                 row_number() over (partition by event_type order by h asc) as rn
          from hashed
        ),
        kth as (
          select event_type, max(h) as hk, count(*) as k_eff
          from ranked where rn <= 64 group by event_type
        ),
        exact as (select event_type, count(*) as n_exact from du group by event_type)
        select e.event_type, e.n_exact,
               cast(k.k_eff as int) as k_used,
               round(cast(k.k_eff - 1 as double)
                     * cast(1152921504606846976 as double) / k.hk, 2) as kmv_estimate
        from exact e join kth k on k.event_type = e.event_type
    """

    # KMV mergeability — the property that matters in a distributed engine:
    # the GLOBAL distinct estimate is computed by merging the per-group
    # sketches (union their element sets, re-take the k minima) without
    # touching raw data again; same-user hashes collide across groups, so
    # the union dedupes exactly as the math requires
    q["sketch_kmv_union"] = f"""
        with du as (select distinct event_type, user_id from events),
        hashed0 as (select event_type, {kmv_h} as h from du),
        {kmv_prune}
        per_group as (
          select event_type, h,
                 row_number() over (partition by event_type order by h asc) as rn
          from hashed
        ),
        merged as (select distinct h from per_group where rn <= 64),
        mranked as (select h, row_number() over (order by h asc) as rn from merged),
        mk as (select max(h) as hk, count(*) as k_eff from mranked where rn <= 64),
        exact as (select count(distinct user_id) as n_exact from events)
        select cast(e.n_exact as bigint) as n_exact_users,
               cast(k.k_eff as int) as k_used,
               round(cast(k.k_eff - 1 as double)
                     * cast(1152921504606846976 as double) / k.hk, 2) as kmv_union_estimate
        from exact e cross join mk k
    """

    # KMV set-operation estimate: Jaccard from the merged sketch's overlap
    # with both input sketches (rho = |M ∩ A ∩ B| / k), intersection =
    # rho x union estimate — the sketch algebra that lets a planner answer
    # overlap questions from per-partition sketches without re-scanning.
    # Elements are (user, activity-day) pairs of two event types, which
    # overlap PARTIALLY, so the estimate is non-trivial; exact rides along.
    _kx = hh(f"concat('kmvx-', {ts('user_id')}, '|', {ts('cast(ts as date)')})")
    q["sketch_kmv_intersection"] = f"""
        with ea as (
          select distinct {_kx} as h from events where event_type = 'click'
        ),
        eb as (
          select distinct {_kx} as h from events where event_type = 'purchase'
        ),
        sa as (
          select h from (
            select h, row_number() over (order by h asc) as rn from ea
          ) r where rn <= 64
        ),
        sb as (
          select h from (
            select h, row_number() over (order by h asc) as rn from eb
          ) r where rn <= 64
        ),
        mr as (
          select h, row_number() over (order by h asc) as rn
          from (select distinct h
                from (select h from sa union all select h from sb) u) m
        ),
        mk as (select max(h) as hk, count(*) as k_eff from mr where rn <= 64),
        overlap as (
          select count(*) as n_both
          from mr join sa on sa.h = mr.h join sb on sb.h = mr.h
          where mr.rn <= 64
        ),
        exact as (
          select count(*) as n_exact
          from (select h from ea intersect select h from eb) i
        )
        select cast(exact.n_exact as bigint) as n_exact,
               cast(mk.k_eff as int) as k_used,
               cast(overlap.n_both as int) as k_both,
               round(cast(overlap.n_both as double) / mk.k_eff, 6) as jaccard_est,
               round((cast(overlap.n_both as double) / mk.k_eff)
                     * (cast(mk.k_eff - 1 as double)
                        * cast(1152921504606846976 as double) / mk.hk), 2)
                 as kmv_intersection_estimate
        from exact cross join mk cross join overlap
    """

    # ---- geo: cell index / tile codec over synthetic points ----------------
    px, py = synth_px("c_custkey"), synth_py("c_custkey")
    cells = ", ".join(
        f"{cell_id_sql(px, py, r, d)} as cell_r{r}" for r in (4, 7, 10)
    )
    q["geo_cells_multires"] = f"""
        select c_custkey as point_id, {cells}
        from customer
    """

    q["geo_cell_prefix_stats"] = f"""
        with pts as (select c_custkey, {cell_id_sql(px, py, 10, d)} as cell from customer)
        select cast(floor(cell / 4096.0) as bigint) as prefix_r4, count(*) as n_points,
               min(cell) as min_cell, max(cell) as max_cell
        from pts group by 1
    """

    # tile cover: the covering z8-tiles of each supplier bbox (the
    # mapbox/tile-cover utility as a declarative query — same clamped
    # nested explode the bbox-overlap join uses internally)
    tcz = 8
    tcn = 1 << tcz
    sx_, sy_ = synth_px("s_suppkey"), synth_py("s_suppkey")
    half = "(cast('0.011' as double) + (s_suppkey % 5) * cast('0.0037' as double))"

    def _tc_clamp(e):
        return f"cast(least(greatest(floor(({e}) * {tcn}), 0), {tcn - 1}) as bigint)"

    if d == "spark":
        tc_from = (
            f"lateral view explode(sequence({_tc_clamp(f'({sx_}) - {half}')}, "
            f"{_tc_clamp(f'({sx_}) + {half}')})) tx_t as tx "
            f"lateral view explode(sequence({_tc_clamp(f'({sy_}) - {half}')}, "
            f"{_tc_clamp(f'({sy_}) + {half}')})) ty_t as ty"
        )
    else:
        tc_from = (
            f"cross join generate_series(0, {tcn - 1}) as gx(tx) "
            f"cross join generate_series(0, {tcn - 1}) as gy(ty) "
            f"where gx.tx between {_tc_clamp(f'({sx_}) - {half}')} "
            f"and {_tc_clamp(f'({sx_}) + {half}')} "
            f"and gy.ty between {_tc_clamp(f'({sy_}) - {half}')} "
            f"and {_tc_clamp(f'({sy_}) + {half}')}"
        )
    q["geo_tile_cover"] = f"""
        select s_suppkey as box_id, {tcz} as z, tx, ty,
               (({tcn} * ty + tx) * 32) + {tcz} as tile_id
        from supplier {tc_from}
    """

    # zonal statistics: deterministic raster values (portable hash of the
    # cell key) aggregated over each zone's cell cover — the classic
    # raster<->vector zonal-stats workload on the same clamped cover
    # explode as geo_tile_cover; partial aggregation absorbs the cover
    # fan-out map-side
    zval = hh(f"concat('rv-', {ts(f'{tcn} * ty + tx')})")
    q["geo_zonal_stats"] = f"""
        with cover as (
          select s_suppkey as zone_id, tx, ty from supplier {tc_from}
        ),
        valued as (
          select zone_id, tx, ty, ({zval}) % 1000 as rv from cover
        )
        select zone_id,
               cast(count(*) as bigint) as n_cells,
               cast(sum(rv) as bigint) as sum_val,
               cast(min(rv) as int) as min_val,
               cast(max(rv) as int) as max_val
        from valued group by zone_id
    """

    # k-ring: every cell within Chebyshev distance 2 of each point's cell
    # at res 6, tagged with its ring index — the kNN/distance joins build
    # these neighborhoods internally; this exposes them as a query surface
    krz = 6
    krn = 1 << krz
    kx = f"cast(least(greatest(floor(({px}) * {krn}), 0), {krn - 1}) as bigint)"
    ky = f"cast(least(greatest(floor(({py}) * {krn}), 0), {krn - 1}) as bigint)"
    if d == "spark":
        kr_from = (
            "lateral view explode(sequence(-2, 2)) dxt as dx "
            "lateral view explode(sequence(-2, 2)) dyt as dy"
        )
    else:
        kr_from = (
            "cross join generate_series(-2, 2) as gdx(dx) "
            "cross join generate_series(-2, 2) as gdy(dy)"
        )
    q["geo_cell_kring"] = f"""
        with pts as (select c_custkey as point_id, {kx} as ix, {ky} as iy from customer)
        select point_id,
               cast(greatest(abs(dx), abs(dy)) as int) as ring,
               (ix + dx) as nx, (iy + dy) as ny,
               ({krn} * (iy + dy) + (ix + dx)) as cell
        from pts {kr_from}
        where ix + dx >= 0 and ix + dx < {krn}
          and iy + dy >= 0 and iy + dy < {krn}
    """

    z = 7
    n = 1 << z
    q["geo_tile_codec"] = f"""
        with pts as (
          select c_custkey,
                 cast(least(greatest(floor(({px}) * {n}), 0), {n - 1}) as bigint) as tx,
                 cast(least(greatest(floor(({py}) * {n}), 0), {n - 1}) as bigint) as ty
          from customer)
        select tx, ty, (({n} * ty + tx) * 32) + {z} as tile_id, count(*) as n_points
        from pts group by tx, ty
    """

    # raster <-> vector overlay: raster tiles synthesized from part rows,
    # vector-feature tiles from customer points, equi-joined on the packed
    # pyramid address (toID codec, geojsonvt.hpp:66-68)
    ppx, ppy = synth_px("p_partkey"), synth_py("p_partkey")
    q["geo_raster_overlay"] = f"""
        with vect as (
          select cast(least(greatest(floor(({px}) * {n}), 0), {n - 1}) as bigint) as tx,
                 cast(least(greatest(floor(({py}) * {n}), 0), {n - 1}) as bigint) as ty,
                 count(*) as n_features
          from customer group by 1, 2),
        rast as (
          select cast(least(greatest(floor(({ppx}) * {n}), 0), {n - 1}) as bigint) as tx,
                 cast(least(greatest(floor(({ppy}) * {n}), 0), {n - 1}) as bigint) as ty,
                 count(*) as n_rasters
          from part group by 1, 2)
        select (({n} * v.ty + v.tx) * 32) + {z} as tile_id,
               v.tx, v.ty, v.n_features, r.n_rasters,
               v.n_features * r.n_rasters as n_overlay_pairs
        from vect v join rast r on v.tx = r.tx and v.ty = r.ty
    """

    # ---- dedup --------------------------------------------------------------
    q["dedup_exact"] = f"""
        select doc_id, md5(text) as text_hash,
               count(*) over (partition by md5(text)) as n_copies
        from documents
    """

    sig_cte = f"""
        with shingles as (
          select doc_id, substr(text, i, 8) as s {_shingles_from(d)}
        ),
        sig as (
          select doc_id,
                 min({hh("concat('0', s)")}) as mh0,
                 min({hh("concat('1', s)")}) as mh1,
                 min({hh("concat('2', s)")}) as mh2,
                 min({hh("concat('3', s)")}) as mh3
          from shingles group by doc_id
        )
    """
    q["dedup_minhash_signatures"] = sig_cte + "select doc_id, mh0, mh1, mh2, mh3 from sig"

    q["dedup_minhash_pairs"] = sig_cte + f"""
        , pairs as (
          select a.doc_id as doc_a, b.doc_id as doc_b
          from sig a join sig b on a.mh0 = b.mh0 and a.mh1 = b.mh1 and a.doc_id < b.doc_id
          union
          select a.doc_id, b.doc_id
          from sig a join sig b on a.mh2 = b.mh2 and a.mh3 = b.mh3 and a.doc_id < b.doc_id
        )
        select doc_a, doc_b from pairs
    """

    # Hot-bucket-capped LSH pairs: a near-duplicate flood puts ~all docs in
    # one band bucket and the plain band self-join explodes to O(n^2) pairs
    # out of a single join key (un-splittable by AQE — the OUTPUT is the
    # problem, not the partition). Buckets of size <= cap keep exact
    # all-pairs semantics; larger buckets emit star pairs through their
    # min-doc_id hub — O(n) edges that preserve the connectivity the pairs
    # feed into (dedup_clusters connected components). cap matches
    # operators/dedup.py:LSH_BUCKET_CAP.
    cap = 8
    capped_bands = "\n union \n".join(
        f"""select a.doc_id as doc_a, b.doc_id as doc_b
          from t{i} a join t{i} b
            on a.k1 = b.k1 and a.k2 = b.k2 and a.doc_id < b.doc_id
          where a.bn <= {cap}
          union
          select hub as doc_a, doc_id as doc_b
          from t{i} where bn > {cap} and doc_id <> hub"""
        for i in (1, 2)
    )
    q["dedup_minhash_pairs_capped"] = sig_cte + f"""
        , t1 as (
          select doc_id, mh0 as k1, mh1 as k2,
                 count(*) over (partition by mh0, mh1) as bn,
                 min(doc_id) over (partition by mh0, mh1) as hub
          from sig),
        t2 as (
          select doc_id, mh2 as k1, mh3 as k2,
                 count(*) over (partition by mh2, mh3) as bn,
                 min(doc_id) over (partition by mh2, mh3) as hub
          from sig)
        select distinct doc_a, doc_b from ({capped_bands}) p
    """

    q["dedup_simhash"] = f"""
        with words as (select doc_id, w {_words_from(d)}),
        wh as (select doc_id, {hh('w')} as h from words),
        bits as (
          select doc_id, bt.b,
                 sum(case when (h >> bt.b) & 1 = 1 then 1 else -1 end) as vote
          from wh {_bits_join(d, 0, 15)}
          group by doc_id, bt.b
        )
        select doc_id,
               cast(sum(case when vote > 0 then cast(pow(2, b) as bigint) else 0 end) as bigint) as simhash16
        from bits group by doc_id
    """

    # simhash near-dup pairs: Hamming-LSH with GUARANTEED recall — 4 bands
    # of 4 bits, so any pair at hamming distance <= 3 shares at least one
    # identical band (pigeonhole); candidates refine by exact popcount on
    # the xor. Completes the simhash family (fingerprint -> pairs).
    xor_ = (lambda a, b: f"({a} ^ {b})") if d == "spark" else (
        lambda a, b: f"xor({a}, {b})"
    )
    band_joins = "\n union \n".join(
        f"""select a.doc_id as doc_a, b.doc_id as doc_b,
                   a.simhash16 as sh_a, b.simhash16 as sh_b
            from sh a join sh b
              on (a.simhash16 >> {4 * i}) % 16 = (b.simhash16 >> {4 * i}) % 16
             and a.doc_id < b.doc_id"""
        for i in range(4)
    )
    q["dedup_simhash_pairs"] = f"""
        with sh as ({q["dedup_simhash"]}),
        cand as ({band_joins})
        select doc_a, doc_b,
               cast(bit_count({xor_('sh_a', 'sh_b')}) as int) as hamming
        from cand
        where bit_count({xor_('sh_a', 'sh_b')}) <= 3
    """

    q["dedup_ngram_jaccard"] = f"""
        with grams as (
          select distinct doc_id, substr(text, i, 4) as g {_shingles_from(d, n=4)}
        ),
        sizes as (select doc_id, count(*) as n from grams group by doc_id),
        pairs as (select a.doc_id as doc_a, a.doc_id + 250 as doc_b from documents a where a.doc_id < 250),
        inter as (
          select p.doc_a, p.doc_b, count(*) as n_inter
          from pairs p
          join grams ga on ga.doc_id = p.doc_a
          join grams gb on gb.doc_id = p.doc_b and gb.g = ga.g
          group by p.doc_a, p.doc_b
        )
        select i.doc_a, i.doc_b, i.n_inter, sa.n as n_a, sb.n as n_b,
               round(cast(i.n_inter as double) / (sa.n + sb.n - i.n_inter), 6) as jaccard
        from inter i
        join sizes sa on sa.doc_id = i.doc_a
        join sizes sb on sb.doc_id = i.doc_b
    """

    # ---- text analysis -------------------------------------------------------
    markers = [("en", " the "), ("de", " der "), ("fr", " le "), ("es", " el "), ("zh", " zh ")]
    mcols = ", ".join(
        f"{occurrences('text', m, d)} as c_{lang}" for lang, m in markers
    )
    q["text_lang_id"] = f"""
        with scores as (select doc_id, lang as labeled_lang, {mcols} from documents)
        select doc_id, labeled_lang,
               case greatest(c_en, c_de, c_fr, c_es, c_zh)
                 when c_en then 'en' when c_de then 'de' when c_fr then 'fr'
                 when c_es then 'es' else 'zh' end as guessed_lang,
               c_en, c_de, c_fr, c_es, c_zh
        from scores
    """

    n_tok = occurrences("text", " ", d)
    q["text_quality_score"] = f"""
        select doc_id,
               length(text) as n_chars_actual,
               {n_tok} + 1 as n_tokens,
               round(cast(length(text) as double) / ({n_tok} + 1), 4) as mean_token_len,
               {occurrences('text', 'the', d)} as n_stopword,
               round(({n_tok} + 1) / cast(1000 as double)
                     + least(cast({occurrences('text', 'the', d)} as double) / ({n_tok} + 1), 0.5), 6)
                 as quality_score
        from documents
    """

    q["text_token_stats"] = f"""
        with words as (select doc_id, w {_words_from(d)})
        select doc_id, count(*) as n_tokens, count(distinct w) as n_distinct,
               min(length(w)) as min_len, max(length(w)) as max_len
        from words group by doc_id
    """

    q["text_fingerprint"] = f"""
        select doc_id,
               md5(lower(replace(text, ' ', ''))) as fingerprint,
               {hh("lower(replace(text, ' ', ''))")} as fingerprint60
        from documents
    """

    # duplicate-n-gram repetition signals (the Gopher/Dolma-style quality
    # filter): share of repeated char-8-grams and the single hottest gram's
    # coverage — high values flag boilerplate/looping text for corpus
    # filtering. Same shingle generator as the minhash family, so the
    # 100 TB plan is one explode + two hash aggregates (partial+final),
    # no self-join.
    q["text_repetition"] = f"""
        with g as (
          select doc_id, substr(text, i, 8) as g {_shingles_from(d, n=8)}
        ),
        per_gram as (
          select doc_id, g, count(*) as cnt from g group by doc_id, g
        ),
        stats as (
          select doc_id,
                 cast(sum(cnt) as bigint) as n_grams,
                 cast(count(*) as bigint) as n_distinct,
                 cast(max(cnt) as bigint) as top_gram_count
          from per_gram group by doc_id
        )
        select doc_id, n_grams, n_distinct, top_gram_count,
               round(1 - cast(n_distinct as double) / n_grams, 6) as dup_ratio,
               round(cast(top_gram_count as double) / n_grams, 6) as top_gram_share
        from stats
    """

    # ---- spatial index range scan -------------------------------------------
    # bbox retrieval THROUGH the cell index: cover cells at res 6 equi-join
    # the points' cell ids (the partition-prunable index access path at
    # scale — a range scan over Morton keys), then the exact bbox refine.
    # DELIBERATE dialect asymmetry: the DuckDB oracle is the naive full-scan
    # bbox filter, so the hash match PROVES the cover is complete and the
    # refine exact — not merely that two engines computed one formula alike.
    _rq = {
        "x0": "cast('0.2' as double)", "x1": "cast('0.45' as double)",
        "y0": "cast('0.3' as double)", "y1": "cast('0.6' as double)",
    }
    if d == "spark":
        _cover_src = (
            "(select explode(sequence(12, 28)) as ix) gx "
            "cross join (select explode(sequence(19, 38)) as iy) gy"
        )
        # integer cell coords -> the cell id via the cell-center unit coord
        _cov_cell = cell_id_sql(
            "(gx.ix + cast('0.5' as double)) / cast(64 as double)",
            "(gy.iy + cast('0.5' as double)) / cast(64 as double)", 6, d,
        )
        q["geo_cell_range_query"] = f"""
            with pts as (
              select c_custkey as point_id,
                     {synth_px('c_custkey')} as px, {synth_py('c_custkey')} as py
              from customer
            ),
            idx as (
              select point_id, px, py, {cell_id_sql('px', 'py', 6, d)} as cell
              from pts
            ),
            cover as (select {_cov_cell} as cell from {_cover_src})
            select i.point_id, i.px, i.py
            from idx i join cover c on i.cell = c.cell
            where i.px >= {_rq['x0']} and i.px <= {_rq['x1']}
              and i.py >= {_rq['y0']} and i.py <= {_rq['y1']}
        """
    else:
        q["geo_cell_range_query"] = f"""
            select c_custkey as point_id,
                   {synth_px('c_custkey')} as px, {synth_py('c_custkey')} as py
            from customer
            where {synth_px('c_custkey')} >= {_rq['x0']}
              and {synth_px('c_custkey')} <= {_rq['x1']}
              and {synth_py('c_custkey')} >= {_rq['y0']}
              and {synth_py('c_custkey')} <= {_rq['y1']}
        """

    # ---- similarity over embeddings -----------------------------------------
    elems = _vec_elems(d)
    # oracle form only: the global row_number window is what DuckDB needs for
    # the hash comparison; the engine's operator (operators/dedup.py
    # cosine_top_k) computes the same `cos` scores then takes the top-k with
    # orderBy().limit() (TakeOrderedAndProject — distributed partial top-k),
    # stamping sim_rank over the k survivors only.
    q["sim_cosine_topk"] = f"""
        with cos as ({cosine_scores_sql(d)}),
        ranked as (
          select vec_id, cosine,
                 row_number() over (order by cosine desc, vec_id asc) as sim_rank
          from cos
        )
        select vec_id, cosine, sim_rank from ranked where sim_rank <= 10
    """

    # random-hyperplane LSH: h_j[i] deterministic pseudo-random from (j, i)
    plane = "(((bt.b * 73856093 + e.i * 19349663) % 1000003) / cast(1000003 as double) - cast(0.5 as double))"
    q["sim_lsh_buckets"] = f"""
        with e as ({elems}),
        proj as (
          select e.vec_id, bt.b, sum(e.x * {plane}) as dot
          from e {_bits_join(d, 0, 7)}
          group by e.vec_id, bt.b
        )
        select vec_id,
               cast(sum(case when dot > 0 then cast(pow(2, b) as bigint) else 0 end) as bigint) as lsh_bucket
        from proj group by vec_id
    """

    # embedding-cosine near-dup: candidate pairs from 4-bit hyperplane-LSH
    # buckets, refined by exact cosine >= threshold (synthetic embeddings
    # have max pairwise cosine ~0.51, so the threshold is 0.35)
    q["dedup_embedding_neardup"] = f"""
        with e as ({elems}),
        proj as (
          select e.vec_id, bt.b, sum(e.x * {plane}) as dot
          from e {_bits_join(d, 0, 3)}
          group by e.vec_id, bt.b
        ),
        buckets as (
          select vec_id,
                 cast(sum(case when dot > 0 then cast(pow(2, b) as bigint) else 0 end) as bigint) as bkt
          from proj group by vec_id
        ),
        pairs as (
          select a.vec_id as va, b.vec_id as vb
          from buckets a join buckets b on a.bkt = b.bkt and a.vec_id < b.vec_id
        ),
        dots as (
          select p.va, p.vb,
                 sum(ea.x * eb.x) as dot, sum(ea.x * ea.x) as na, sum(eb.x * eb.x) as nb
          from pairs p
          join e ea on ea.vec_id = p.va
          join e eb on eb.vec_id = p.vb and eb.i = ea.i
          group by p.va, p.vb
        )
        select va, vb, round(dot / (sqrt(na) * sqrt(nb)), 6) as cosine
        from dots
        where dot / (sqrt(na) * sqrt(nb)) >= 0.35
    """

    # all-pairs ANN: per-vector top-2 neighbors among 4-bit LSH bucket
    # mates — the window is partitioned per vector and its candidate set is
    # bounded by the bucket size, so no single-task global sort exists at
    # any scale; ranking on the ROUNDED cosine (then neighbor id) keeps the
    # tie-break bit-identical across engines
    q["sim_ann_bucket_topk"] = f"""
        with e as ({elems}),
        proj as (
          select e.vec_id, bt.b, sum(e.x * {plane}) as dot
          from e {_bits_join(d, 0, 3)}
          group by e.vec_id, bt.b
        ),
        buckets as (
          select vec_id,
                 cast(sum(case when dot > 0 then cast(pow(2, b) as bigint) else 0 end) as bigint) as bkt
          from proj group by vec_id
        ),
        pairs as (
          select a.vec_id as va, b.vec_id as vb
          from buckets a join buckets b on a.bkt = b.bkt and a.vec_id <> b.vec_id
        ),
        dots as (
          select p.va, p.vb,
                 sum(ea.x * eb.x) as dot, sum(ea.x * ea.x) as na, sum(eb.x * eb.x) as nb
          from pairs p
          join e ea on ea.vec_id = p.va
          join e eb on eb.vec_id = p.vb and eb.i = ea.i
          group by p.va, p.vb
        ),
        cos as (
          select va, vb, round(dot / (sqrt(na) * sqrt(nb)), 6) as cosine from dots
        ),
        ranked as (
          select va, vb, cosine,
                 row_number() over (partition by va order by cosine desc, vb asc) as ann_rank
          from cos
        )
        select va as vec_id, vb as neighbor_id, cosine, ann_rank
        from ranked where ann_rank <= 2
    """

    # ---- training-data pipeline compositions ------------------------------
    # post-dedup corpus selection: one keeper per simhash bucket (the
    # filter a pipeline applies AFTER candidate generation + clustering;
    # simhash16 collides heavily by design, so this genuinely merges)
    simhash_cte = f"""
        with words as (select doc_id, w {_words_from(d)}),
        wh as (select doc_id, {hh('w')} as h from words),
        bits as (
          select doc_id, bt.b,
                 sum(case when (h >> bt.b) & 1 = 1 then 1 else -1 end) as vote
          from wh {_bits_join(d, 0, 15)}
          group by doc_id, bt.b
        ),
        sh as (
          select doc_id,
                 cast(sum(case when vote > 0 then cast(pow(2, b) as bigint) else 0 end) as bigint) as simhash16
          from bits group by doc_id
        )
    """
    q["dedup_keep_corpus"] = simhash_cte + """
        select cast(min(doc_id) as bigint) as doc_id,
               simhash16 as bucket,
               cast(count(*) as bigint) as n_merged
        from sh group by simhash16
    """

    # deterministic train/val split on a portable content-free hash of the
    # doc id (survives repartitioning/reruns; the split a training pipeline
    # stamps before sharding)
    split_h = hh(f"concat('split-', {ts('doc_id')})")
    q["text_train_split"] = f"""
        with s as (
          select doc_id,
                 case when ({split_h}) % 10 < 9 then 'train' else 'val' end as split
          from documents
        )
        select split, cast(count(*) as bigint) as n_docs,
               cast(min(doc_id) as bigint) as min_doc,
               cast(max(doc_id) as bigint) as max_doc
        from s group by split
    """

    # train/val DECONTAMINATION: near-dup candidate pairs (minhash LSH
    # bands, same sig CTE as dedup_minhash_pairs) that STRADDLE the
    # deterministic split — exactly the leakage a training pipeline must
    # catch before shipping an eval set. Composition, one extra join pair.
    q["dedup_cross_split_leakage"] = sig_cte + f"""
        , pairs as (
          select a.doc_id as doc_a, b.doc_id as doc_b
          from sig a join sig b on a.mh0 = b.mh0 and a.mh1 = b.mh1 and a.doc_id < b.doc_id
          union
          select a.doc_id, b.doc_id
          from sig a join sig b on a.mh2 = b.mh2 and a.mh3 = b.mh3 and a.doc_id < b.doc_id
        ),
        s as (
          select doc_id,
                 case when ({split_h}) % 10 < 9 then 'train' else 'val' end as split
          from documents
        )
        select p.doc_a, p.doc_b, sa.split as split_a, sb.split as split_b
        from pairs p
        join s sa on sa.doc_id = p.doc_a
        join s sb on sb.doc_id = p.doc_b
        where sa.split <> sb.split
    """

    # deterministic stratified sampling: per-language portable-hash
    # Bernoulli rates (lang 'en' 50%, everything else 20%) + per-stratum
    # accounting — reproducible on any cluster, no RNG state
    samp_h = hh(f"concat('sample-', {ts('doc_id')})")
    q["corpus_sample_stratified"] = f"""
        with rated as (
          select doc_id, lang,
                 case when lang = 'en' then 50 else 20 end as pct,
                 ({samp_h}) % 100 as bucket
          from documents
        )
        select lang,
               cast(count(*) as bigint) as n_docs,
               cast(sum(case when bucket < pct then 1 else 0 end) as bigint) as n_sampled,
               cast(min(case when bucket < pct then doc_id end) as bigint) as first_sampled,
               cast(max(case when bucket < pct then doc_id end) as bigint) as last_sampled
        from rated group by lang
    """

    # composite quality gate: every document scored + flagged (flags, not a
    # filter, so the oracle checks the predicate on every row)
    ntok = occurrences("text", " ", d)
    nstop = occurrences("text", "the", d)
    q["text_quality_filter"] = f"""
        select doc_id,
               length(text) as n_chars,
               {ntok} + 1 as n_tokens,
               {nstop} as n_stop,
               cast(case when length(text) >= 64
                          and {ntok} + 1 between 8 and 4000
                          and {nstop} >= 1
                    then 1 else 0 end as int) as keep_flag
        from documents
    """

    # corpus-level top-k character 3-grams: a global ORDER BY + LIMIT plans
    # as TakeOrderedAndProject in Spark (map-side partial top-k) — no
    # single-task global sort; (count desc, gram asc) is a total order, so
    # the limit boundary is deterministic in both engines
    q["text_top_ngrams"] = f"""
        with grams as (select substr(text, i, 3) as g {_shingles_from(d, n=3)})
        select g as gram, cast(count(*) as bigint) as n
        from grams
        where length(g) = 3
        group by g
        order by n desc, g asc
        limit 20
    """

    # doc-length histogram (exact integer buckets — percentile functions
    # diverge across engines, bucket counts do not)
    q["text_length_histogram"] = f"""
        select cast(floor(length(text) / 100) as int) as bucket,
               cast(count(*) as bigint) as n_docs,
               cast(min(length(text)) as int) as min_chars,
               cast(max(length(text)) as int) as max_chars
        from documents
        group by cast(floor(length(text) / 100) as int)
    """

    # tf-idf top terms: per-document top-3 distinctive words. Rank key is
    # (ROUNDED score desc, term asc) in both dialects so a last-ULP ln()
    # difference between libm implementations cannot flip row selection.
    # Scale shape: df is a corpus-wide partial-aggregable term count; the
    # per-doc window partition is bounded by the document's vocabulary.
    q["text_tfidf_top_terms"] = f"""
        with words as (select doc_id, w {_words_from(d)}),
        tf as (
          select doc_id, w, count(*) as tf
          from words where length(w) > 0 group by doc_id, w
        ),
        df as (select w, count(distinct doc_id) as df from tf group by w),
        n as (select count(distinct doc_id) as n_docs from tf),
        scored as (
          select tf.doc_id, tf.w as term,
                 round(tf.tf * ln(cast(n.n_docs as double) / df.df), 6) as tfidf
          from tf join df on df.w = tf.w cross join n
        ),
        ranked as (
          select doc_id, term, tfidf,
                 row_number() over (
                   partition by doc_id order by tfidf desc, term asc
                 ) as rnk
          from scored
        )
        select doc_id, cast(rnk as int) as term_rank, term, tfidf
        from ranked where rnk <= 3
    """

    # overlapping training chunks: 200-char windows at stride 150 (50-char
    # overlap), last partial window kept — the LLM-corpus chunking shape.
    # greatest(.., 0): Spark's sequence(0, -1) DESCENDS for empty text.
    n_chunk_hi = f"greatest(cast(floor((length(text)-1)/150) as int), 0)"
    if d == "spark":
        chunk_from = (
            f"from documents lateral view explode(sequence(0, {n_chunk_hi})) t as i"
        )
    else:
        chunk_from = (
            f"from documents cross join generate_series(0, {MAX_DOC_CHARS // 150 + 1}) as g(i) "
            f"where g.i <= {n_chunk_hi}"
        )
    q["text_chunks"] = f"""
        select doc_id, cast(i as int) as chunk_idx,
               substr(text, i*150 + 1, 200) as chunk_text,
               cast(length(substr(text, i*150 + 1, 200)) as int) as chunk_chars
        {chunk_from}
    """

    # ---- multimodal metadata (decode itself is stubbed; see multimodal.py) --
    doc_str = ts("doc_id")
    w_expr = f"({hh(f'concat(~w-~, {doc_str})')} % 1920) + 1".replace("~", "'")
    h_expr = f"({hh(f'concat(~h-~, {doc_str})')} % 1080) + 1".replace("~", "'")
    q["mm_media_meta"] = f"""
        select doc_id,
               substr(md5(concat('media-', {doc_str})), 1, 8) as media_magic,
               {w_expr} as width,
               {h_expr} as height,
               ({w_expr}) * ({h_expr}) * 3 as n_bytes_rgb
        from documents
    """

    return {k: " ".join(v.split()) for k, v in q.items()}
