"""Spatial-join operators: point-in-polygon, kNN, raster<->vector overlay.

North-rule operators with no reference implementation (the reference is a
tiler; its only lookup is the tile-id hash probe, geojsonvt.hpp:117-150).
Design:

- **Candidates via the cell index** (functions/cells.py): polygons are
  assigned an adaptive resolution (finest whose bbox cover stays small) and
  exploded into covering cells with PURE column expressions
  (``sequence``/``explode`` + Morton spread — JVM codegen, no Python);
  points compute one cell per indexed resolution. The equi-join on
  (res, cell) is an ordinary shuffle join Catalyst can reorder, broadcast
  (``broadcast=True`` for small polygon sets) or AQE-skew-split.
- **Exact ray-cast refinement** has three physical strategies:
  ``method='native'`` (default) explodes polygons into an edge table once
  and evaluates the even-odd crossing test as pure column expressions with
  a map-side-combinable parity aggregate — zero Python in the hot path,
  whole-stage codegen end to end; ``broadcast=True`` ships a geometry dict
  to executors and refines in one narrow Arrow kernel (zero shuffles, for
  small polygon sets); ``method='cogroup'`` cogroups candidates with
  geometry so each polygon's geometry moves exactly once (when the polygon
  side is too big to broadcast but per-group Arrow framing is acceptable).
  All three produce identical rows (holes fall out of the even-odd rule).
- **Skew**: pass ``salt > 1`` to replicate the polygon-cell build side and
  scatter hot cells deterministically (hash of the point id), on top of AQE.
- **kNN** adapts H3-style k-ring expansion to the batch model: a bounded
  neighborhood join at a chosen resolution, a certification predicate
  (kth-candidate distance < neighborhood safe radius), and a straggler
  fallback for the (few) uncertified queries — ring doubling by default at
  scale (ordinary equi-joins, exact at full grid cover), broadcast brute
  force only under a site-count gate. Every point gets exact top-k.
- **distance_join / bbox_overlap_join** reuse the same cell machinery for
  radius and rectangle-overlap (range) joins; the bbox join dedupes
  multi-cell matches with a report-once responsibility cell instead of a
  distinct shuffle.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.functions import cells as C
from geojson_vt_cpp_spark.operators import codec

DEFAULT_RESOLUTIONS = (4, 7, 10)


def project_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    """WGS84 -> unit Web-Mercator as native column expressions (P1,
    convert.hpp:23-29) — stays in whole-stage codegen."""
    import math

    x = lon / 360.0 + 0.5
    sine = F.sin(lat * math.pi / 180.0)
    y = 0.5 - 0.25 * F.log((1.0 + sine) / (1.0 - sine)) / math.pi
    y = F.least(F.greatest(y, F.lit(0.0)), F.lit(1.0))
    return x, y


# ---------------------------------------------------------------------------
# polygon covering cells (native column expressions)
# ---------------------------------------------------------------------------

def _spread_sql(col: Column) -> Column:
    return C.spread_bits(col)


def polygon_cover_cells(
    polys_df: DataFrame,
    resolutions: tuple[int, ...] = DEFAULT_RESOLUTIONS,
    max_cells: int = 32,
) -> DataFrame:
    """features-table polygons -> (poly columns..., res, cell) cover rows.

    Adaptive resolution pick and bbox cover are pure column arithmetic;
    the cover explode is ``explode(sequence(x0,x1)) x explode(sequence(
    y0,y1))``. Conservative (bbox) cover — the exact ray-cast refines.
    """
    res_arr = sorted(resolutions, reverse=True)
    # finest res whose bbox cover is <= max_cells
    res_col = F.lit(min(resolutions))
    for r in sorted(resolutions):  # end with finest that fits => build when-chain
        n = 1 << r
        cx = F.floor(F.col("maxx") * n) - F.floor(F.col("minx") * n) + 1
        cy = F.floor(F.col("maxy") * n) - F.floor(F.col("miny") * n) + 1
        res_col = F.when(cx * cy <= max_cells, F.lit(r)).otherwise(res_col)

    df = polys_df.withColumn("res", res_col)
    n_of = F.expr("shiftleft(1L, res)").cast("double")
    cap = F.expr("shiftleft(1L, res)") - 1

    def clamp(c):
        return F.least(F.greatest(c.cast("long"), F.lit(0)), cap)

    df = (
        df.withColumn("cx0", clamp(F.floor(F.col("minx") * n_of)))
        .withColumn("cx1", clamp(F.floor(F.col("maxx") * n_of)))
        .withColumn("cy0", clamp(F.floor(F.col("miny") * n_of)))
        .withColumn("cy1", clamp(F.floor(F.col("maxy") * n_of)))
        .withColumn("ix", F.explode(F.sequence("cx0", "cx1")))
        .withColumn("iy", F.explode(F.sequence("cy0", "cy1")))
        .withColumn(
            "cell",
            _spread_sql(F.col("ix")).bitwiseOR(F.shiftleft(_spread_sql(F.col("iy")), 1)),
        )
        .drop("cx0", "cx1", "cy0", "cy1", "ix", "iy")
    )
    return df


def point_cells(
    points_df: DataFrame,
    resolutions: tuple[int, ...] = DEFAULT_RESOLUTIONS,
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """points -> one row per indexed resolution with its cell id."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("res"),
                C.cell_id(F.col(x_col), F.col(y_col), r).alias("cell"),
            )
            for r in resolutions
        ]
    )
    return (
        points_df.withColumn("rc", F.explode(pairs))
        .withColumn("res", F.col("rc.res"))
        .withColumn("cell", F.col("rc.cell"))
        .drop("rc")
    )


# ---------------------------------------------------------------------------
# exact ray-cast (Arrow kernel)
# ---------------------------------------------------------------------------

def ray_cast_np(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd point-in-polygon for a batch of points vs one polygon.

    rings: list of (n,2) float arrays (closing vertex optional — the test
    wraps implicitly). Vectorized points x edges; holes fall out of the
    even-odd rule.
    """
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        if ring.shape[0] < 3:
            continue
        xi = ring[:, 0]
        yi = ring[:, 1]
        xj = np.roll(xi, 1)
        yj = np.roll(yi, 1)
        # (P, E) broadcasting
        y_between = (yi[None, :] > py[:, None]) != (yj[None, :] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            x_cross = (xj - xi)[None, :] * (py[:, None] - yi[None, :]) / (
                yj - yi
            )[None, :] + xi[None, :]
        crossings = y_between & (px[:, None] < x_cross)
        inside ^= (crossings.sum(axis=1) % 2).astype(bool)
    return inside


def _polygon_edges(polys_keyed: DataFrame) -> DataFrame:
    """(poly_sk, e_xi, e_yi, e_xj, e_yj, p_miny, p_maxy) — one row per ring
    edge, carrying the polygon's y-extent for strip bucketing. Horizontal
    edges (e_yi == e_yj, including the degenerate wrap edge of explicitly
    closed rings) are dropped here: the even-odd test's ``y_between``
    predicate is identically false for them, so they can never contribute a
    crossing — shipping them to the candidate join is pure overhead. One
    Arrow pass over the SMALL polygon side; the hot candidate join never
    touches Python."""
    schema = (
        "poly_sk long, e_xi double, e_yi double, e_xj double, e_yj double, "
        "p_miny double, p_maxy double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for sk_v, xs_v, ys_v, pl_v, mny, mxy in zip(
                pdf["poly_sk"], pdf["xs"], pdf["ys"], pdf["part_lens"],
                pdf["miny"], pdf["maxy"],
            ):
                xs = np.asarray(xs_v, dtype=np.float64)
                ys = np.asarray(ys_v, dtype=np.float64)
                off = 0
                for n in np.asarray(pl_v, dtype=np.int64):
                    n = int(n)
                    if n >= 3:
                        rx = xs[off:off + n]
                        ry = ys[off:off + n]
                        xi = np.roll(rx, 1)
                        yi = np.roll(ry, 1)
                        keep = yi != ry  # horizontal edges never cross
                        if keep.any():
                            m = int(keep.sum())
                            out.append(
                                pd.DataFrame({
                                    "poly_sk": np.full(m, sk_v, dtype=np.int64),
                                    "e_xi": xi[keep], "e_yi": yi[keep],
                                    "e_xj": rx[keep], "e_yj": ry[keep],
                                    "p_miny": np.full(m, mny),
                                    "p_maxy": np.full(m, mxy),
                                })
                            )
                    off += n
            if out:
                yield pd.concat(out, ignore_index=True)

    return polys_keyed.select(
        "poly_sk", "xs", "ys", "part_lens", "miny", "maxy"
    ).mapInPandas(kernel, schema)


# strips per polygon bbox for the parity join (see _strip_of): each candidate
# point joins only the edges whose y-interval reaches its strip — cuts the
# candidatesxedges fan-out by roughly the strip count for typical outlines
# (an edge spans few strips; 16 keeps replication ~1.5x while dividing the
# per-candidate edge fan-out by an order of magnitude)
PIP_Y_STRIPS = int(os.environ.get("SPARK_GRAFT_PIP_STRIP_N", "16"))


def _strip_of(y: Column, miny: Column, maxy: Column, s: int = PIP_Y_STRIPS) -> Column:
    """Strip index of ``y`` within [miny, maxy], clamped to [0, s-1].

    The SAME expression shape must be used for candidate points and edge
    endpoints: floor(((y - miny) * s) / h) is monotone in y for h > 0 under
    IEEE arithmetic (subtraction, multiplication by a positive constant,
    division by a positive constant and floor are all monotone), so an edge
    whose y-interval contains a point's y always lands on the point's strip
    — the strip join loses no crossing edge and the parity is exact.
    """
    h = maxy - miny
    raw = F.floor(((y - miny) * F.lit(float(s))) / h)
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(s - 1))
    return F.when(h > 0, clamped).otherwise(F.lit(0)).cast("int")


def point_in_polygon_join(
    points_df: DataFrame,
    polys_df: DataFrame,
    point_cols: tuple[str, str, str] = ("point_id", "px", "py"),
    resolutions: tuple[int, ...] = DEFAULT_RESOLUTIONS,
    broadcast: bool = False,
    salt: int = 1,
    method: str = "native",
    broadcast_edges: bool | None = None,
    edge_broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """(point_id, px, py) x polygon features -> matched pairs.

    Returns one row per (point, containing polygon) with the polygon's
    identity columns (doc_id, span_idx, feature_idx, member_seq,
    feature_id, props_json).

    ``broadcast_edges`` controls the native path's candidatesxedges
    refinement join: True ships the edge table to every executor (no
    shuffle, and one hot polygon cannot converge its candidates onto one
    reducer); None counts polygon vertices once and broadcasts under
    ``edge_broadcast_threshold`` edges. When the edge table is too big to
    broadcast AND ``salt > 1``, the salt is carried through to the parity
    join key (edges replicated salt ways), so the skew split survives the
    refinement stage instead of re-converging on raw poly_sk.
    """
    pid, xcol, ycol = point_cols
    polys = polys_df.where(F.col("gtype").isin(3, 6))
    id_cols = ["doc_id", "span_idx", "feature_idx", "member_seq"]
    attr_cols = ["feature_id", "props_json"]
    geom_cols = ["xs", "ys", "part_lens"]

    # cover rows carry ONLY a long surrogate key + bbox + (res, cell[, salt])
    # — geometry never rides the (cells x salt)-exploded build side, and the
    # candidate shuffle moves longs, not id strings. The bbox goes along so
    # candidates prune NATIVELY (whole-stage codegen) before any Python: the
    # cell cover is conservative, the bbox test is exact per feature (the F2
    # analogue, clip.hpp:287-293).
    sk = F.xxhash64(*id_cols).alias("poly_sk")
    cover = polygon_cover_cells(
        polys.select(sk, "minx", "miny", "maxx", "maxy"), resolutions
    ).select("poly_sk", "res", "cell", "minx", "miny", "maxx", "maxy")
    polys_keyed = polys.select(
        F.xxhash64(*id_cols).alias("poly_sk"), *id_cols, *attr_cols, *geom_cols,
        "miny", "maxy",
    )

    pts = point_cells(points_df.select(pid, xcol, ycol), resolutions, xcol, ycol)
    if salt > 1:
        cover = cover.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(F.col(pid)), F.lit(salt)))
        keys = ["res", "cell", "salt"]
    else:
        keys = ["res", "cell"]

    right = F.broadcast(cover) if broadcast else cover
    cand_cols = [pid, xcol, ycol, "poly_sk"] + (["salt"] if salt > 1 else [])
    # "strip" is the candidate's y-strip within its polygon's bbox — the
    # native parity join keys on it (poly_sk, strip) so each candidate only
    # meets the edges whose y-interval can actually contain its y (the
    # bbox prune guarantees ycol is inside [miny, maxy] here, so the strip
    # expression sees only in-range values)
    cand = (
        pts.join(right, keys, "inner")
        # exact bbox prune in codegen before any Python crossing
        .where(
            (F.col(xcol) >= F.col("minx")) & (F.col(xcol) <= F.col("maxx"))
            & (F.col(ycol) >= F.col("miny")) & (F.col(ycol) <= F.col("maxy"))
        )
        .select(
            *cand_cols,
            _strip_of(F.col(ycol), F.col("miny"), F.col("maxy")).alias("strip"),
        )
    )

    pid_type = points_df.schema[pid].dataType.simpleString()
    out_schema = ", ".join(
        [f"{pid} {pid_type}", f"{xcol} double", f"{ycol} double",
         "doc_id string", "span_idx int", "feature_idx int", "member_seq int",
         "feature_id string", "props_json string"]
    )
    out_cols = [pid, xcol, ycol] + id_cols + attr_cols

    def rings_of(xs_v, ys_v, part_lens_v) -> list[np.ndarray]:
        xs = np.asarray(xs_v, dtype=np.float64)
        ys = np.asarray(ys_v, dtype=np.float64)
        rings = []
        off = 0
        for n in np.asarray(part_lens_v, dtype=np.int64):
            rings.append(np.stack([xs[off:off + n], ys[off:off + n]], axis=1))
            off += int(n)
        return rings

    if broadcast:
        cand = cand.drop("strip")  # the Arrow kernel refines per polygon
        # geometry as a broadcast dict keyed on the surrogate; the
        # refinement is a pure narrow mapInPandas — zero shuffles end to end
        geo_rows = polys_keyed.drop("miny", "maxy").collect()
        bc = points_df.sparkSession.sparkContext.broadcast(
            {
                r["poly_sk"]: (
                    rings_of(r["xs"], r["ys"], r["part_lens"]),
                    tuple(r[c] for c in id_cols),
                    r["feature_id"], r["props_json"],
                )
                for r in geo_rows
            }
        )

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            geo = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                rows = []
                for key, grp in pdf.groupby("poly_sk", sort=False):
                    entry = geo.get(key)
                    if entry is None:
                        continue
                    hit = ray_cast_np(
                        grp[xcol].to_numpy(np.float64),
                        grp[ycol].to_numpy(np.float64),
                        entry[0],
                    )
                    if hit.any():
                        sel = grp.loc[hit, [pid, xcol, ycol]].copy()
                        for c, v in zip(id_cols, entry[1]):
                            sel[c] = v
                        sel["feature_id"] = entry[2]
                        sel["props_json"] = entry[3]
                        rows.append(sel[out_cols])
                if rows:
                    yield pd.concat(rows, ignore_index=True)

        return cand.mapInPandas(kernel, out_schema)

    if method == "native":
        # fully JVM path: explode polygons into an edge table once (small
        # side), join candidates x edges on the surrogate key, evaluate the
        # even-odd crossing test as a pure column expression, and count
        # crossing parity with a map-side-combinable aggregate. No Python in
        # the hot path at all — whole-stage codegen end to end; the
        # per-group applyInPandas framing cost (measured ~23s for 41k groups
        # at this bench scale) disappears.
        # edges explode into the y-strips their interval spans (monotone
        # strip mapping, see _strip_of): the parity join keys on
        # (poly_sk, strip), so a candidate meets ~E/strips edges instead of
        # all E edges of its polygon — the candidatesxedges fan-out (the
        # dominant row count of this whole operator) drops by roughly the
        # strip count for modest edge replication
        use_strips = os.environ.get("SPARK_GRAFT_PIP_STRIPS", "1") != "0"
        raw_edges = _polygon_edges(polys_keyed)
        lo = F.least(F.col("e_yi"), F.col("e_yj"))
        hi = F.greatest(F.col("e_yi"), F.col("e_yj"))
        if use_strips:
            edges = raw_edges.withColumn(
                "strip",
                F.explode(
                    F.sequence(
                        _strip_of(lo, F.col("p_miny"), F.col("p_maxy")),
                        _strip_of(hi, F.col("p_miny"), F.col("p_maxy")),
                    )
                ),
            ).drop("p_miny", "p_maxy")
        else:
            edges = raw_edges.drop("p_miny", "p_maxy")
        jkeys = ["poly_sk", "strip"] if use_strips else ["poly_sk"]
        if broadcast_edges is None:
            n_edges = polys.agg(
                F.sum(F.size("xs")).alias("n")
            ).first()["n"] or 0
            broadcast_edges = n_edges <= edge_broadcast_threshold
        pxc, pyc = F.col(xcol), F.col(ycol)
        yi, yj, xi, xj = F.col("e_yi"), F.col("e_yj"), F.col("e_xi"), F.col("e_xj")
        y_between = (yi > pyc) != (yj > pyc)
        x_cross = (xj - xi) * (pyc - yi) / (yj - yi) + xi
        crossing = (y_between & (pxc < x_cross)).cast("int")
        if not use_strips:
            cand = cand.drop("strip")
        if not broadcast_edges and os.environ.get("SPARK_GRAFT_PIP_SHJ", "1") != "0":
            # when the caller ruled the edge table out for broadcasting,
            # make sure Catalyst doesn't sneak one in from a bad estimate:
            # a driver-built multi-ten-MB hashed relation showed up as
            # whole-session GC pressure (slower UNRELATED queries) and
            # occasional multi-second build stalls. A shuffled-hash join
            # moves both (small) sides once and builds per-partition.
            edges = edges.hint("shuffle_hash")
        if broadcast_edges:
            joined = cand.join(F.broadcast(edges), jkeys)
        elif salt > 1:
            # keep the skew split through the refinement: replicate edges
            # per salt bucket so each hot polygon's candidates stay spread
            edges = edges.withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
            )
            joined = cand.join(edges, jkeys[:1] + ["salt"] + jkeys[1:])
        else:
            joined = cand.join(edges, jkeys)
        hits = (
            joined.groupBy(pid, xcol, ycol, "poly_sk")
            .agg(F.sum(crossing).alias("n_cross"))
            .where(F.pmod(F.col("n_cross"), F.lit(2)) == 1)
        )
        return hits.join(
            polys_keyed.select("poly_sk", *id_cols, *attr_cols), "poly_sk"
        ).select(*out_cols)

    # cogrouped applyInPandas on the long surrogate key — candidates shuffle
    # as (pid, x, y, sk) rows, each polygon's geometry moves exactly once
    def cogroup_kernel(cand_pdf: pd.DataFrame, poly_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty or poly_pdf.empty:
            return pd.DataFrame(columns=out_cols)
        prow = poly_pdf.iloc[0]
        rings = rings_of(prow["xs"], prow["ys"], prow["part_lens"])
        hit = ray_cast_np(
            cand_pdf[xcol].to_numpy(np.float64),
            cand_pdf[ycol].to_numpy(np.float64),
            rings,
        )
        sel = cand_pdf.loc[hit, [pid, xcol, ycol]].copy()
        for c in id_cols:
            sel[c] = prow[c]
        sel["feature_id"] = prow["feature_id"]
        sel["props_json"] = prow["props_json"]
        return sel[out_cols]

    return (
        cand.drop("strip").groupby("poly_sk")
        .cogroup(polys_keyed.drop("miny", "maxy").groupby("poly_sk"))
        .applyInPandas(cogroup_kernel, out_schema)
    )


# ---------------------------------------------------------------------------
# kNN via bounded neighborhood join + certification + straggler fallback
# ---------------------------------------------------------------------------

def knn_join(
    queries_df: DataFrame,
    sites_df: DataFrame,
    k: int = 5,
    res: int = 7,
    ring: int = 1,
    query_cols: tuple[str, str, str] = ("query_id", "qx", "qy"),
    site_cols: tuple[str, str, str] = ("site_id", "sx", "sy"),
    fallback: str = "auto",
    broadcast_max_sites: int = 2_000_000,
) -> DataFrame:
    """Exact k-nearest-sites per query (Euclidean in projected space).

    Phase 1: join each query's (2*ring+1)^2 cell neighborhood at ``res``
    against site cells; a query is CERTIFIED when it has >= k candidates and
    its kth candidate distance < ring*cell_size (any site close enough to
    beat the kth must then lie inside the joined neighborhood).

    Phase 2 (the uncertified stragglers — certification is density-sized so
    these are rare):

    - ``fallback="broadcast"``: brute force against ALL sites broadcast.
      Exact and one-shot, but only sound when the site table fits in
      executor memory — the small-dims case, NOT the 100-TB case.
    - ``fallback="ring"``: iterative ring doubling — re-join only the
      pending queries at ring 2r, 4r, ... (cell-clamped ``sequence``
      explodes, so wide rings never build giant literal arrays), accepting
      each query as soon as it certifies at its ring; when the ring covers
      the whole grid the join IS the exhaustive join and every remaining
      query is exact by construction. O(log(n/ring)) rounds, all ordinary
      equi-joins Catalyst/AQE can shuffle or broadcast by its own sizing —
      nothing forces the full site table through one executor.
    - ``fallback="auto"`` (default): broadcast when ``sites_df`` has at
      most ``broadcast_max_sites`` rows (one count job), else ring.

    Both fallbacks produce identical rows (same tie-breaks: dist2, site_id),
    so results are deterministic regardless of path.
    """
    qid, qx, qy = query_cols
    sid, sx, sy = site_cols
    n = 1 << res
    cell_size = 1.0 / n

    qcell = queries_df.select(
        qid, qx, qy,
        F.least(F.greatest(F.floor(F.col(qx) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("qix"),
        F.least(F.greatest(F.floor(F.col(qy) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("qiy"),
    )
    offs = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    nbr = qcell.withColumn(
        "nbr",
        F.explode(F.array(*[
            F.struct(
                (F.col("qix") + dx).alias("ix"),
                (F.col("qiy") + dy).alias("iy"),
            )
            for dx, dy in offs
        ])),
    ).select(
        qid, qx, qy,
        F.col("nbr.ix").alias("ix"), F.col("nbr.iy").alias("iy"),
    ).where(
        (F.col("ix") >= 0) & (F.col("ix") < n) & (F.col("iy") >= 0) & (F.col("iy") < n)
    )

    scell = sites_df.select(
        sid, sx, sy,
        F.least(F.greatest(F.floor(F.col(sx) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("ix"),
        F.least(F.greatest(F.floor(F.col(sy) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("iy"),
    )

    # plain products, not pow(x,2): pow goes through libm and is not
    # guaranteed bit-identical to x*x, which the cross-engine oracle needs
    d2 = (F.col(qx) - F.col(sx)) * (F.col(qx) - F.col(sx)) + (
        F.col(qy) - F.col(sy)
    ) * (F.col(qy) - F.col(sy))
    cand = (
        nbr.join(scell, ["ix", "iy"], "inner")
        .select(qid, qx, qy, sid, d2.alias("dist2"))
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy(qid).orderBy(F.col("dist2").asc(), F.col(sid).asc())
    # materialize the ranked candidates once: cert, the certified output and
    # the straggler set all read it — without this the neighborhood join +
    # window would recompute for each consumer. eager=False: the checkpoint
    # write fuses into the first consuming job (cert / the isEmpty gate)
    # instead of paying a separate whole-plan checkpoint job; under AQE the
    # upstream shuffle stages still run at construction, but the result
    # stage (the expensive window pass over every candidate) runs once,
    # inside the consumer.
    ranked = (
        cand.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .localCheckpoint(eager=False)
    )
    safe2 = (ring * cell_size) ** 2
    # materialized once: good, the straggler probe, AND the auto-fallback
    # isEmpty gate all read cert — without this each consumer re-runs the
    # certification aggregate over the ranked checkpoint (lazy for the same
    # job-fusion reason; KB-sized per-query rows)
    cert = ranked.groupBy(qid).agg(
        F.count("*").alias("n_cand"), F.max("dist2").alias("kth_d2")
    ).withColumn(
        "certified", (F.col("n_cand") >= k) & (F.col("kth_d2") < safe2)
    ).localCheckpoint(eager=False)
    good = ranked.join(cert.where("certified").select(qid), qid, "inner")

    # stragglers: uncertified queries plus queries with zero candidates
    bad_q = qcell.join(
        cert.where(~F.col("certified")).select(qid), qid, "inner"
    ).unionByName(
        qcell.join(cert.select(qid), qid, "left_anti")
    )

    if fallback == "auto":
        # don't pay the sites count job when there are no stragglers to
        # route — the common density-sized case certifies every query
        if bad_q.isEmpty():
            return good
        fallback = (
            "broadcast" if sites_df.count() <= broadcast_max_sites else "ring"
        )
    if fallback == "broadcast":
        brute = (
            bad_q.crossJoin(F.broadcast(sites_df.select(sid, sx, sy)))
            .select(qid, qx, qy, sid, d2.alias("dist2"))
            .withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
        )
        return good.unionByName(brute)
    if fallback != "ring":
        raise ValueError(f"unknown fallback {fallback!r}")

    def neighborhood(qdf: DataFrame, r: int) -> DataFrame:
        # clamped sequences: (2r+1)^2 neighbor cells without literal arrays
        return qdf.withColumn(
            "ix",
            F.explode(F.sequence(
                F.greatest(F.col("qix") - r, F.lit(0)),
                F.least(F.col("qix") + r, F.lit(n - 1)),
            )),
        ).withColumn(
            "iy",
            F.explode(F.sequence(
                F.greatest(F.col("qiy") - r, F.lit(0)),
                F.least(F.col("qiy") + r, F.lit(n - 1)),
            )),
        ).select(qid, qx, qy, "ix", "iy")

    parts = [good]
    pending = bad_q.localCheckpoint(eager=False)
    r = ring
    while not pending.isEmpty():
        r *= 2
        ranked_r = (
            neighborhood(pending, r)
            .join(scell, ["ix", "iy"], "inner")
            .select(qid, qx, qy, sid, d2.alias("dist2"))
            .withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
            .localCheckpoint(eager=False)
        )
        if r >= n:  # ring covers the grid: exhaustive, exact by construction
            parts.append(ranked_r)
            break
        cert_r = ranked_r.groupBy(qid).agg(
            F.count("*").alias("n_cand"), F.max("dist2").alias("kth_d2")
        ).where(
            (F.col("n_cand") >= k) & (F.col("kth_d2") < F.lit((r * cell_size) ** 2))
        ).select(qid)
        parts.append(ranked_r.join(cert_r, qid, "inner"))
        pending = pending.join(cert_r, qid, "left_anti").localCheckpoint(eager=False)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def distance_join(
    queries_df: DataFrame,
    sites_df: DataFrame,
    radius: float,
    res: int | None = None,
    query_cols: tuple[str, str, str] = ("query_id", "qx", "qy"),
    site_cols: tuple[str, str, str] = ("site_id", "sx", "sy"),
) -> DataFrame:
    """Exact radius join: every (query, site) pair with Euclidean distance
    <= ``radius`` in projected space — (query_id, site_id, dist2).

    Shape: cover each query with the cell neighborhood that provably
    contains every site within ``radius`` (ring = ceil(radius * n) at grid
    resolution ``res``, clamped ``sequence`` explodes), equi-join on the
    cell, then the exact distance filter — an ordinary shuffle join
    Catalyst/AQE plans freely; no window, no broadcast requirement, no
    all-pairs stage at any scale. ``res`` defaults to the resolution where
    one cell ~ the radius (ring 1-2), trading neighborhood width against
    cell population like the kNN join does.
    """
    import math

    qid, qx, qy = query_cols
    sid, sx, sy = site_cols
    if res is None:
        # radius-based anchor: one cell ~ the radius (ring 1-2)
        r_res = max(1, min(12, int(math.floor(math.log2(1.0 / radius)))))
        # density adjustment (mirrors kNN's sizing): aim for ~2 sites/cell
        # so hot grids refine (fewer candidates per cell, slightly wider
        # ring) and sparse grids coarsen (fewer explode rows). Bounded to
        # r_res +/- 2 so ring = ceil(radius * n) never exceeds ~4 cells —
        # results are EXACT at any res; this only shapes the plan.
        n_sites = sites_df.count()
        d_res = max(1, round(math.log(max(n_sites, 4) / 2.0, 4)))
        res = max(1, min(12, max(r_res - 2, min(r_res + 2, d_res))))
    n = 1 << res
    ring = max(1, int(math.ceil(radius * n)))

    qcell = queries_df.select(
        qid, qx, qy,
        F.least(F.greatest(F.floor(F.col(qx) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("qix"),
        F.least(F.greatest(F.floor(F.col(qy) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("qiy"),
    )
    nbr = qcell.withColumn(
        "ix",
        F.explode(F.sequence(
            F.greatest(F.col("qix") - ring, F.lit(0)),
            F.least(F.col("qix") + ring, F.lit(n - 1)),
        )),
    ).withColumn(
        "iy",
        F.explode(F.sequence(
            F.greatest(F.col("qiy") - ring, F.lit(0)),
            F.least(F.col("qiy") + ring, F.lit(n - 1)),
        )),
    ).select(qid, qx, qy, "ix", "iy")
    scell = sites_df.select(
        sid, sx, sy,
        F.least(F.greatest(F.floor(F.col(sx) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("ix"),
        F.least(F.greatest(F.floor(F.col(sy) * n).cast("long"), F.lit(0)), F.lit(n - 1)).alias("iy"),
    )
    # x*x products, not pow: bit parity with the DuckDB oracle
    d2 = (F.col(qx) - F.col(sx)) * (F.col(qx) - F.col(sx)) + (
        F.col(qy) - F.col(sy)
    ) * (F.col(qy) - F.col(sy))
    return (
        nbr.join(scell, ["ix", "iy"], "inner")
        .select(qid, qx, qy, sid, d2.alias("dist2"))
        .where(F.col("dist2") <= float(radius) * float(radius))
        .select(qid, sid, "dist2")
    )


def bbox_overlap_join(
    a_df: DataFrame,
    b_df: DataFrame,
    res: int = 6,
    a_cols: tuple[str, str, str, str, str] = ("a_id", "ax1", "ay1", "ax2", "ay2"),
    b_cols: tuple[str, str, str, str, str] = ("b_id", "bx1", "by1", "bx2", "by2"),
) -> DataFrame:
    """Exact rectangle-overlap (2-D interval range) join: every (a, b) pair
    whose axis-aligned boxes intersect (closed intervals).

    Shape: both sides explode to their covering cells at ``res`` (clamped
    ``sequence``), equi-join on the cell, exact overlap filter — and
    instead of a ``distinct`` shuffle to dedupe pairs that share several
    cells, each pair is REPORTED ONCE in its responsibility cell (the cell
    containing the intersection's min corner: a standard spatial-join
    dedup that costs one codegen predicate instead of a global shuffle).
    """
    aid, ax1, ay1, ax2, ay2 = a_cols
    bid, bx1, by1, bx2, by2 = b_cols
    n = 1 << res

    def cells(df: DataFrame, idc: str, x1: str, y1: str, x2: str, y2: str) -> DataFrame:
        def c(col):
            return F.least(F.greatest(F.floor(F.col(col) * n).cast("long"), F.lit(0)), F.lit(n - 1))

        return df.withColumn(
            "ix", F.explode(F.sequence(c(x1), c(x2)))
        ).withColumn(
            "iy", F.explode(F.sequence(c(y1), c(y2)))
        )

    ac = cells(a_df.select(aid, ax1, ay1, ax2, ay2), aid, ax1, ay1, ax2, ay2)
    bc = cells(b_df.select(bid, bx1, by1, bx2, by2), bid, bx1, by1, bx2, by2)
    joined = ac.join(bc, ["ix", "iy"], "inner")
    overlap = (
        (F.col(ax1) <= F.col(bx2)) & (F.col(bx1) <= F.col(ax2))
        & (F.col(ay1) <= F.col(by2)) & (F.col(by1) <= F.col(ay2))
    )

    def clamp_cell(expr):
        return F.least(F.greatest(F.floor(expr * n).cast("long"), F.lit(0)), F.lit(n - 1))

    responsible = (
        (F.col("ix") == clamp_cell(F.greatest(F.col(ax1), F.col(bx1))))
        & (F.col("iy") == clamp_cell(F.greatest(F.col(ay1), F.col(by1))))
    )
    return joined.where(overlap & responsible).select(aid, bid)


# ---------------------------------------------------------------------------
# raster <-> vector overlay
# ---------------------------------------------------------------------------

def raster_tiles_from_documents(docs_df: DataFrame) -> DataFrame:
    """media spans ('raster://{z}/{x}/{y}.png') -> raster tile table."""
    spans = docs_df.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
    m = spans.where(F.col("span.kind") == "media").select(
        "doc_id",
        "span_idx",
        F.col("span.media_ref").alias("media_ref"),
        F.regexp_extract("span.media_ref", r"raster://(\d+)/(\d+)/(\d+)", 1).cast("int").alias("z"),
        F.regexp_extract("span.media_ref", r"raster://(\d+)/(\d+)/(\d+)", 2).cast("long").alias("tx"),
        F.regexp_extract("span.media_ref", r"raster://(\d+)/(\d+)/(\d+)", 3).cast("long").alias("ty"),
    )
    return m.where(F.col("media_ref") != "")


def raster_vector_overlay(raster_df: DataFrame, tile_features_df: DataFrame) -> DataFrame:
    """Equi-join raster tiles to vector tile features on the pyramid address
    (tile-id codec Q2, geojsonvt.hpp:66-68) — a plain broadcast/shuffle join
    Catalyst plans freely."""
    return raster_df.alias("r").join(
        tile_features_df.alias("t"), ["z", "tx", "ty"], "inner"
    )
