"""One-shuffle positioning ensemble: the whole §3.2 pipeline as array expressions.

The multi-pass pipeline (pipeline.position_observations) expresses each phase
— context, selection, four closed-form algorithms, numeric tier, combiner —
as its own aggregation/join over the observation rows. Correct, but the plan
is a dozen exchanges deep: at small scale wall-clock is dominated by stage
scheduling, codegen, and Python-worker spin-up; at 100 TB it is a dozen
passes over the fact table.

Every phase keys on request_id and every request holds ≤20 observations, so
the Spark-first shape is: ONE hash aggregate packs each request into an
array-of-structs row, then every algorithm becomes higher-order array
expressions (transform/filter/aggregate — JVM-side, codegen'd), and the only
Python hop is a mapInPandas over the minority of rows whose selection
includes trilateration/MLE. Physics gating happens on the nested scan array
before anything is exploded.

Total plan: explode → broadcast AP join → 1 shuffle (groupBy pack) →
projections → (split) mapInPandas on numeric-selected rows → union → final
projection. Reference semantics per phase are documented in the row-wise
twins (context.py, selection.py, algorithms.py, numeric.py, combiner.py),
which remain the auditable implementation and the parity test baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wifi_location_data_pipeline_spark import config as C
from wifi_location_data_pipeline_spark.positioning.combiner import combine_packed
from wifi_location_data_pipeline_spark.positioning.numeric import (
    _group_arrays,
    _mle_batch,
    _trilat_arrays,
)
from wifi_location_data_pipeline_spark.positioning.prepare import (
    explode_requests,
    join_known_aps,
)
from wifi_location_data_pipeline_spark.positioning.selection import (
    ALGORITHMS,
    BASE_WEIGHTS,
    DISTRIBUTION_MULT,
    GEOMETRY_MULT,
    SIGNAL_MULT,
)

SINGULARITY = 1e-10
COLLINEARITY_MAX_DEVIATION_DEG = 0.0002

POSITION_STRUCT = (
    "algorithm string, latitude double, longitude double, altitude double, "
    "accuracy double, confidence double"
)


# ---------------------------------------------------------------------------
# small array helpers
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# physics gate on the nested scan array (SignalPhysicsValidator.java:31-107)
# ---------------------------------------------------------------------------


def physics_valid_expr(scans: Column) -> Column:
    """TRUE iff the request's scan set passes the physics checks.

    Same semantics as prepare.physics_gate, evaluated on the nested array so
    no pre-join shuffle is needed: any RSSI outside [-100,-30] fails; within a
    frequency group, max > -50 dBm with spread > 45 dB fails (the exact
    [-30,-100] boundary pair passes).
    """
    s = lambda x: x.getField("signalStrength")  # noqa: E731
    rssi_ok = ~F.exists(
        scans, lambda x: (s(x) > C.PHYSICS_RSSI_MAX) | (s(x) < C.PHYSICS_RSSI_MIN)
    )
    freqs = F.array_distinct(F.transform(scans, lambda x: x.getField("frequency")))

    def freq_bad(f: Column) -> Column:
        grp = F.filter(scans, lambda x: x.getField("frequency").eqNullSafe(f))
        mx = F.array_max(F.transform(grp, s))
        mn = F.array_min(F.transform(grp, s))
        return (
            (mx > C.PHYSICS_STRONG_SIGNAL_GATE)
            & ((mx - mn) > C.PHYSICS_MAX_SPREAD_DB)
            & ~((mx == C.PHYSICS_RSSI_MAX) & (mn == C.PHYSICS_RSSI_MIN))
        )

    return rssi_ok & ~F.exists(freqs, freq_bad)


# ---------------------------------------------------------------------------
# context classes from the packed arrays (context.py twin)
# ---------------------------------------------------------------------------


def _sacc(arr: Column, fields: dict[str, tuple[Column, object]]) -> Column:
    """Single-traversal struct-accumulator aggregate over an array column.

    ``fields`` maps name → (init literal, merge(acc_field, x) → new value).
    One O(K) pass computes every sum — the higher-order functions are
    interpreted (not codegen'd), so N separate aggregate columns over the
    same array cost N full traversals with the per-element tree re-evaluated
    each time; this collapses them to one.
    """
    names = list(fields)
    init = F.struct(*[fields[n][0].alias(n) for n in names])
    merge = lambda acc, x: F.struct(  # noqa: E731
        *[fields[n][1](acc.getField(n), x).alias(n) for n in names]
    )
    return F.aggregate(arr, init, merge)


def _signal_stats_col(arr: Column) -> Column:
    """One-pass stats over the full observation array: signal sums for the
    context classes + accuracy/quality sums shared by WCL and RSSI-ratio."""
    s = lambda x: x.getField("signal_strength")  # noqa: E731
    hacc = lambda x: x.getField("ap_haccuracy")  # noqa: E731
    return _sacc(
        arr,
        {
            "s_sum": (F.lit(0.0), lambda a, x: a + s(x)),
            "s_sq": (F.lit(0.0), lambda a, x: a + s(x) * s(x)),
            "s_max": (F.lit(-1e9), lambda a, x: F.greatest(a, s(x))),
            "sq_sum": (
                F.lit(0.0),
                lambda a, x: a
                + F.least(F.lit(1.0), F.greatest(F.lit(0.0), (s(x) + 95.0) / 45.0)),
            ),
            "hacc_sum": (F.lit(0.0), lambda a, x: a + F.coalesce(hacc(x), F.lit(0.0))),
            "hacc_n": (
                F.lit(0.0),
                lambda a, x: a + F.when(hacc(x).isNotNull(), 1.0).otherwise(0.0),
            ),
        },
    )


def _signal_context_from_stats() -> dict[str, Column]:
    """Context classes from the named ``_stats`` struct column."""
    st = F.col("_stats")
    n = F.size(F.col("arr")).cast("double")
    avg = st.getField("s_sum") / n
    var = F.when(
        n > 1.0,
        F.greatest(F.lit(0.0), (st.getField("s_sq") - n * avg * avg) / (n - 1.0)),
    ).otherwise(0.0)
    sd = F.sqrt(var)
    mx = st.getField("s_max")
    return {
        "_avg_rssi": avg,
        "_signal_quality": F.when(avg > C.SIGNAL_STRONG_DBM, "STRONG_SIGNAL")
        .when(avg > C.SIGNAL_MEDIUM_DBM, "MEDIUM_SIGNAL")
        .when(avg > C.SIGNAL_WEAK_DBM, "WEAK_SIGNAL")
        .otherwise("VERY_WEAK_SIGNAL"),
        "_signal_distribution": F.when(sd > C.DISTRIBUTION_OUTLIER_STDDEV, "SIGNAL_OUTLIERS")
        .when(sd > C.DISTRIBUTION_MIXED_STDDEV, "MIXED_SIGNALS")
        .otherwise("UNIFORM_SIGNALS"),
        "_all_very_weak": mx < C.ALL_WEAK_RSSI_GATE,
    }


def _geometry_stage1(ded: Column) -> dict[str, Column]:
    """Geometry pass 1 over the deduped AP array: means + WCL-style estimate.

    Emitted as NAMED columns so downstream expressions reference leaf
    attributes instead of re-inlining these aggregate trees (unchecked
    inlining blows the analyzer up combinatorially — the selection CASEs
    alone would copy the GDOP tree ~30×)."""
    lat = lambda x: x.getField("ap_lat")  # noqa: E731
    lon = lambda x: x.getField("ap_lon")  # noqa: E731
    s = lambda x: x.getField("signal_strength")  # noqa: E731
    w = lambda x: F.pow(  # noqa: E731
        10.0, F.greatest(F.lit(0.0), F.least(F.lit(1.0), (s(x) + 30.0) / (-70.0)))
    )
    g1 = _sacc(
        ded,
        {
            "lat": (F.lit(0.0), lambda a, x: a + lat(x)),
            "lon": (F.lit(0.0), lambda a, x: a + lon(x)),
            "w": (F.lit(0.0), lambda a, x: a + w(x)),
            "wlat": (F.lit(0.0), lambda a, x: a + lat(x) * w(x)),
            "wlon": (F.lit(0.0), lambda a, x: a + lon(x) * w(x)),
        },
    )
    return {"_n_aps": F.size(ded).cast("double"), "_g1": g1}


def _geometry_stage1b() -> dict[str, Column]:
    n = F.col("_n_aps")
    g1 = F.col("_g1")
    return {
        "_mean_lat": g1.getField("lat") / n,
        "_mean_lon": g1.getField("lon") / n,
        "_est_lat": g1.getField("wlat") / g1.getField("w"),
        "_est_lon": g1.getField("wlon") / g1.getField("w"),
    }


def _geometry_stage2(ded: Column) -> dict[str, Column]:
    """Geometry pass 2: covariances (one traversal, named means as leaves)."""
    lat = lambda x: x.getField("ap_lat")  # noqa: E731
    lon = lambda x: x.getField("ap_lon")  # noqa: E731
    mlat, mlon = F.col("_mean_lat"), F.col("_mean_lon")
    cov = _sacc(
        ded,
        {
            "ll": (F.lit(0.0), lambda a, x: a + (lat(x) - mlat) * (lat(x) - mlat)),
            "oo": (F.lit(0.0), lambda a, x: a + (lon(x) - mlon) * (lon(x) - mlon)),
            "lo": (F.lit(0.0), lambda a, x: a + (lat(x) - mlat) * (lon(x) - mlon)),
        },
    )
    n = F.col("_n_aps")
    return {
        "_cov_ll": cov.getField("ll") / n,
        "_cov_oo": cov.getField("oo") / n,
        "_cov_lo": cov.getField("lo") / n,
    }


def _geometry_stage3(ded: Column) -> dict[str, Column]:
    """Geometry pass 3: collinearity deviation + GDOP gram matrix (one
    traversal each, everything else named leaves)."""
    lat = lambda x: x.getField("ap_lat")  # noqa: E731
    lon = lambda x: x.getField("ap_lon")  # noqa: E731
    n = F.col("_n_aps")
    slope = F.try_divide(F.col("_cov_lo"), F.col("_cov_oo"))
    intercept = F.col("_mean_lat") - slope * F.col("_mean_lon")
    max_dev = F.array_max(
        F.transform(ded, lambda x: F.abs(lat(x) - (slope * lon(x) + intercept)))
    )
    is_collinear = (n >= 3) & (
        (F.col("_cov_ll") < SINGULARITY)
        | (F.col("_cov_oo") < SINGULARITY)
        | (F.coalesce(max_dev, F.lit(0.0)) <= COLLINEARITY_MAX_DEVIATION_DEG)
    )
    est_lat, est_lon = F.col("_est_lat"), F.col("_est_lon")
    dx = lambda x: (lon(x) - est_lon) * 111_000.0 * F.cos(F.radians(est_lat))  # noqa: E731
    dy = lambda x: (lat(x) - est_lat) * 111_000.0  # noqa: E731
    r = lambda x: F.greatest(F.sqrt(dx(x) * dx(x) + dy(x) * dy(x)), F.lit(1e-9))  # noqa: E731
    gram = _sacc(
        ded,
        {
            "a": (F.lit(0.0), lambda a, x: a + (dx(x) / r(x)) * (dx(x) / r(x))),
            "b": (F.lit(0.0), lambda a, x: a + (dx(x) / r(x)) * (dy(x) / r(x))),
            "c": (F.lit(0.0), lambda a, x: a + (dy(x) / r(x)) * (dy(x) / r(x))),
        },
    )
    return {"_is_collinear": is_collinear, "_gram": gram}


def _geometry_stage4() -> dict[str, Column]:
    """GDOP value from the named gram-matrix struct."""
    n = F.col("_n_aps")
    a, b, c = (F.col("_gram").getField(f) for f in ("a", "b", "c"))
    det = a * c - b * b
    gdop_raw = F.sqrt(F.try_divide(a + c, det))
    gdop = F.when(F.abs(det) < SINGULARITY, F.lit(C.GDOP_MAX)).otherwise(
        F.coalesce(F.least(F.lit(C.GDOP_MAX), gdop_raw), F.lit(C.GDOP_MAX))
    )
    return {"_gdop": F.when(n < 3, F.lit(C.GDOP_MAX)).otherwise(gdop)}


# ---------------------------------------------------------------------------
# selection weights as a sorted array (selection.py twin)
# ---------------------------------------------------------------------------


def _weight_value(algo: str, table: dict[str, tuple[float, ...]], class_col: Column) -> Column:
    i = ALGORITHMS.index(algo)
    expr = None
    for klass, mults in table.items():
        branch = (class_col == klass, F.lit(float(mults[i])))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    return expr


def _selection_array(ctx: dict[str, Column]) -> Column:
    """Sorted, thresholded, top-K'd (algorithm, weight) array per request."""
    entries = []
    for algo in ALGORITHMS:
        wgt = (
            _weight_value(algo, BASE_WEIGHTS, ctx["ap_count_class"])
            * _weight_value(algo, SIGNAL_MULT, ctx["signal_quality"])
            * _weight_value(algo, GEOMETRY_MULT, ctx["geometric_quality"])
            * _weight_value(algo, DISTRIBUTION_MULT, ctx["signal_distribution"])
        )
        entries.append(F.struct(F.lit(algo).alias("algorithm"), wgt.alias("weight")))
    aw = F.array(*entries)

    eligible = F.filter(aw, lambda x: x.getField("weight") > 0.0)
    cmp = lambda x, y: (  # weight desc, algorithm asc  # noqa: E731
        F.when(x.getField("weight") > y.getField("weight"), -1)
        .when(x.getField("weight") < y.getField("weight"), 1)
        .otherwise(
            F.when(x.getField("algorithm") < y.getField("algorithm"), -1)
            .when(x.getField("algorithm") > y.getField("algorithm"), 1)
            .otherwise(0)
        )
    )
    ranked = F.array_sort(eligible, cmp)
    max_w = F.element_at(F.transform(ranked, lambda x: x.getField("weight")), 1)
    k = F.when(max_w > C.SELECTION_STRONG_MAX_WEIGHT, C.SELECTION_TOP_K_STRONG).otherwise(
        C.SELECTION_TOP_K_DEFAULT
    )
    kept = F.filter(
        ranked,
        lambda x, i: ((x.getField("weight") >= C.SELECTION_MIN_WEIGHT) & (i < k)) | (i == 0),
    )

    very_weak = ctx["all_very_weak"] | (ctx["signal_quality"] == "VERY_WEAK_SIGNAL")
    prox_w = F.greatest(
        F.coalesce(
            F.element_at(
                F.transform(
                    F.filter(aw, lambda x: x.getField("algorithm") == "proximity"),
                    lambda x: x.getField("weight"),
                ),
                1,
            ),
            F.lit(0.0),
        ),
        F.lit(0.5),
    )
    weak_arr = F.array(
        F.struct(F.lit("proximity").alias("algorithm"), prox_w.alias("weight"))
    )
    return F.when(very_weak, weak_arr).otherwise(kept)


# ---------------------------------------------------------------------------
# closed-form algorithms over the packed arrays (algorithms.py twin)
# ---------------------------------------------------------------------------


def _ext_array(arr: Column) -> Column:
    """Per-element derived values for WCL + log-distance, computed ONCE into a
    named array column (the per-element CASE trees are the expensive part)."""
    s = lambda x: x.getField("signal_strength")  # noqa: E731
    vend = lambda x: F.lower(F.trim(x.getField("ap_vendor")))  # noqa: E731
    vendor_n = lambda x: (  # noqa: E731
        F.when(vend(x) == "cisco", 3.0)
        .when(vend(x) == "aruba", 2.8)
        .when(vend(x) == "meraki", 3.0)
        .when(vend(x) == "ubiquiti", 2.7)
        .when(vend(x) == "ruckus", 2.9)
        .when(vend(x) == "hpe-aruba", 2.8)
        .otherwise(C.DEFAULT_PATH_LOSS_EXPONENT)
    )
    n_adj = lambda x: (  # noqa: E731
        F.when(s(x) >= -50.0, vendor_n(x) - F.least(F.lit(1.0), (s(x) + 50.0) / 5.0))
        .when(s(x) <= -80.0, vendor_n(x) + F.least(F.lit(1.5), (-80.0 - s(x)) / 5.0))
        .otherwise(vendor_n(x))
    )
    nn = lambda x: F.greatest(  # noqa: E731
        F.lit(C.PATH_LOSS_EXPONENT_MIN), F.least(F.lit(C.PATH_LOSS_EXPONENT_MAX), n_adj(x))
    )
    ref = lambda x: (  # noqa: E731
        F.when(x.getField("frequency") >= 5000, C.REF_RSSI_5GHZ)
        .when(x.getField("frequency") >= 2400, C.REF_RSSI_2_4GHZ)
        .otherwise(C.REF_RSSI_6GHZ)
    )
    sigma = lambda x: (  # noqa: E731
        F.when(s(x) >= -50.0, C.SHADOW_SIGMA_LOW)
        .when(s(x) <= -80.0, C.SHADOW_SIGMA_HIGH)
        .otherwise(C.SHADOW_SIGMA_MEDIUM)
    )
    dist = lambda x: F.pow(F.lit(10.0), (ref(x) - s(x)) / (10.0 * nn(x))) * (  # noqa: E731
        1.0 + sigma(x) / 10.0
    )
    wcl_w = lambda x: F.pow(  # noqa: E731
        F.lit(10.0),
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), (s(x) - (-30.0)) / (-100.0 - (-30.0)))),
    )
    return F.transform(
        arr,
        lambda x: F.struct(
            x.getField("ap_lat").alias("lat"),
            x.getField("ap_lon").alias("lon"),
            x.getField("ap_alt").alias("alt"),
            dist(x).alias("d"),
            (1.0 / F.greatest(F.lit(1.0), dist(x))).alias("iw"),
            F.greatest(
                F.lit(0.6),
                F.least(
                    F.lit(1.0),
                    (1.0 / (1.0 + F.exp(-4.0 * ((s(x) + 100.0) / 70.0 - 0.5))))
                    * F.greatest(
                        F.lit(0.7), F.coalesce(x.getField("ap_confidence"), F.lit(0.85))
                    )
                    * F.when(x.getField("ap_vendor").isNotNull(), 1.2).otherwise(0.85),
                ),
            ).alias("cw"),
            wcl_w(x).alias("w"),
        ),
    )


def _ext_sums(ext: Column) -> Column:
    """Every WCL + log-distance aggregate in ONE traversal of _ext."""
    g = lambda n: (lambda x: x.getField(n))  # noqa: E731
    has_alt = lambda x: x.getField("alt").isNotNull()  # noqa: E731
    z = F.lit(0.0)
    return _sacc(
        ext,
        {
            "sw": (z, lambda a, x: a + g("w")(x)),
            "swlat": (z, lambda a, x: a + g("lat")(x) * g("w")(x)),
            "swlon": (z, lambda a, x: a + g("lon")(x) * g("w")(x)),
            "swaltn": (z, lambda a, x: a + F.when(has_alt(x), g("alt")(x) * g("w")(x)).otherwise(0.0)),
            "swaltd": (z, lambda a, x: a + F.when(has_alt(x), g("w")(x)).otherwise(0.0)),
            "altn": (z, lambda a, x: a + F.when(has_alt(x), 1.0).otherwise(0.0)),
            "siw": (z, lambda a, x: a + g("iw")(x)),
            "silat": (z, lambda a, x: a + g("lat")(x) * g("iw")(x)),
            "silon": (z, lambda a, x: a + g("lon")(x) * g("iw")(x)),
            "sialtn": (z, lambda a, x: a + F.when(has_alt(x), g("alt")(x) * g("iw")(x)).otherwise(0.0)),
            "sialtd": (z, lambda a, x: a + F.when(has_alt(x), g("iw")(x)).otherwise(0.0)),
            "mind": (F.lit(float("inf")), lambda a, x: F.least(a, g("d")(x))),
            "maxd": (F.lit(float("-inf")), lambda a, x: F.greatest(a, g("d")(x))),
            "scw": (z, lambda a, x: a + g("cw")(x)),
        },
    )


def _pairs_array(arr: Column) -> Column:
    """RSSI-ratio pair values, computed once per pair into a named column.

    Pairs come from the mac-sorted array with position i<j and distinct macs —
    the m1<m2 join semantics of the row-wise rssi_ratio."""
    sz = F.size(arr)
    s = lambda x: x.getField("signal_strength")  # noqa: E731
    raw = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.greatest(sz - (i + 1), F.lit(0))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    raw = F.filter(
        raw,
        lambda p: p.getField("a").getField("mac_addr")
        != p.getField("b").getField("mac_addr"),
    )
    pa = lambda p, n: p.getField("a").getField(n)  # noqa: E731
    pb = lambda p, n: p.getField("b").getField(n)  # noqa: E731
    ratio = lambda p: F.pow(  # noqa: E731
        F.lit(10.0),
        (pa(p, "signal_strength") - pb(p, "signal_strength")) / C.RSSI_RATIO_EXPONENT_DIVISOR,
    )
    interp = lambda p, n: (pa(p, n) + ratio(p) * pb(p, n)) / (1.0 + ratio(p))  # noqa: E731
    return F.transform(
        raw,
        lambda p: F.struct(
            (F.abs(pa(p, "signal_strength") - pb(p, "signal_strength")) / 30.0).alias("pw"),
            interp(p, "ap_lat").alias("plat"),
            interp(p, "ap_lon").alias("plon"),
            (pa(p, "ap_alt").isNotNull() & pb(p, "ap_alt").isNotNull()).alias("has_alt"),
            interp(p, "ap_alt").alias("palt"),
        ),
    )


def _pair_sums(pairs: Column) -> Column:
    g = lambda n: (lambda x: x.getField(n))  # noqa: E731
    z = F.lit(0.0)
    return _sacc(
        pairs,
        {
            "spw": (z, lambda a, p: a + g("pw")(p)),
            "splat": (z, lambda a, p: a + g("plat")(p) * g("pw")(p)),
            "splon": (z, lambda a, p: a + g("plon")(p) * g("pw")(p)),
            "saltn": (
                z,
                lambda a, p: a
                + F.when(g("has_alt")(p), g("palt")(p) * g("pw")(p)).otherwise(0.0),
            ),
            "saltd": (z, lambda a, p: a + F.when(g("has_alt")(p), g("pw")(p)).otherwise(0.0)),
        },
    )


def _closed_positions_from_named(arr: Column, n_scanned: Column) -> Column:
    """[proximity, weighted_centroid, log_distance, rssi_ratio?] built from the
    named single-pass aggregates (_stats, _ext sums, _pair sums, _best)."""
    st, ex, pr = F.col("_stats"), F.col("_exts"), F.col("_prs")
    n = F.size(arr).cast("double")

    best = F.col("_best")
    prox = F.struct(
        F.lit("proximity").alias("algorithm"),
        best.getField("lat").alias("latitude"),
        best.getField("lon").alias("longitude"),
        F.coalesce(best.getField("alt"), F.lit(0.0)).alias("altitude"),
        F.coalesce(best.getField("hacc"), F.lit(C.PROXIMITY_DEFAULT_ACCURACY_M)).alias(
            "accuracy"
        ),
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(C.PROXIMITY_CONF_MAX), (best.getField("s") + 90.0) / 60.0),
        ).alias("confidence"),
    )

    avg_acc = F.when(
        st.getField("hacc_n") > 0.0, st.getField("hacc_sum") / st.getField("hacc_n")
    )
    coverage = n / F.greatest(n_scanned.cast("double"), F.lit(1.0))
    wcl = F.struct(
        F.lit("weighted_centroid").alias("algorithm"),
        (ex.getField("swlat") / ex.getField("sw")).alias("latitude"),
        (ex.getField("swlon") / ex.getField("sw")).alias("longitude"),
        F.coalesce(
            F.try_divide(
                F.when(ex.getField("altn") > 0.0, ex.getField("swaltn")),
                F.when(ex.getField("altn") > 0.0, ex.getField("swaltd")),
            ),
            F.lit(0.0),
        ).alias("altitude"),
        F.coalesce(avg_acc, F.lit(C.WCL_DEFAULT_AP_ACCURACY_M)).alias("accuracy"),
        F.least(F.lit(C.WCL_CONF_CAP), coverage * F.lit(C.WCL_CONF_COVERAGE_COEF)).alias(
            "confidence"
        ),
    )

    avg_s = st.getField("s_sum") / n
    avg_cw = ex.getField("scw") / n
    min_d, max_d = ex.getField("mind"), ex.getField("maxd")
    sr = (avg_s - (-80.0)) / ((-50.0) - (-80.0))
    ld_acc = (
        F.when(avg_s >= -50.0, min_d * 0.5)
        .when(avg_s <= -80.0, max_d * 3.0)
        .otherwise((min_d + max_d) / 2.0 * (3.0 - sr * 2.5))
    )
    ld = F.struct(
        F.lit("log_distance").alias("algorithm"),
        (ex.getField("silat") / ex.getField("siw")).alias("latitude"),
        (ex.getField("silon") / ex.getField("siw")).alias("longitude"),
        F.coalesce(
            F.try_divide(
                F.when(ex.getField("sialtd") > 0.0, ex.getField("sialtn")),
                F.when(ex.getField("sialtd") > 0.0, ex.getField("sialtd")),
            ),
            F.lit(0.0),
        ).alias("altitude"),
        ld_acc.alias("accuracy"),
        F.least(F.lit(0.85), avg_cw).alias("confidence"),
    )

    spw = pr.getField("spw")
    sq = st.getField("sq_sum") / n
    signal_factor = F.greatest(F.lit(1.0), F.least(F.lit(3.0), (-avg_s - 50.0) / 10.0))
    base_conf = F.least(F.lit(0.85), spw / (n * (n - 1.0) / 2.0))
    rr_conf = F.least(F.lit(0.85), base_conf + sq)
    rr_conf = F.when(avg_s >= -70.0, F.greatest(F.lit(0.7), rr_conf)).otherwise(rr_conf)
    rr = F.struct(
        F.lit("rssi_ratio").alias("algorithm"),
        (pr.getField("splat") / spw).alias("latitude"),
        (pr.getField("splon") / spw).alias("longitude"),
        F.coalesce(
            F.try_divide(
                F.when(pr.getField("saltd") > 0.0, pr.getField("saltn")),
                F.when(pr.getField("saltd") > 0.0, pr.getField("saltd")),
            ),
            F.lit(0.0),
        ).alias("altitude"),
        (F.coalesce(avg_acc, F.lit(15.0)) * signal_factor).alias("accuracy"),
        rr_conf.alias("confidence"),
    )

    closed = F.array(prox, wcl, ld)
    # rssi_ratio needs ≥2 obs and ≥1 valid pair (matches the row-wise agg
    # producing no output row otherwise)
    return F.when(
        (F.size(arr) >= 2) & (F.col("_n_pairs") > 0) & spw.isNotNull() & (spw > 0.0),
        F.concat(closed, F.array(rr)),
    ).otherwise(closed)


# ---------------------------------------------------------------------------
# numeric tier: mapInPandas over only the rows that selected trilat/MLE
# ---------------------------------------------------------------------------

_PACKED_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.StringType()),
        T.StructField(
            "selection",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("algorithm", T.StringType()),
                        T.StructField("weight", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "positions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("algorithm", T.StringType()),
                        T.StructField("latitude", T.DoubleType()),
                        T.StructField("longitude", T.DoubleType()),
                        T.StructField("altitude", T.DoubleType()),
                        T.StructField("accuracy", T.DoubleType()),
                        T.StructField("confidence", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def _run_numeric_onepass(batches):
    import pandas as pd

    fields = ("latitude", "longitude", "altitude", "accuracy", "confidence")
    for pdf in batches:
        reqs = [
            (rid, {e["algorithm"] for e in sel}, list(pos), _group_arrays(list(ded)))
            for rid, sel, pos, ded in zip(
                pdf["request_id"], pdf["selection"], pdf["positions"], pdf["_ded"]
            )
        ]
        mle_groups = [g for _, wanted, _, g in reqs if "maximum_likelihood" in wanted]
        mle_results = iter(_mle_batch(mle_groups))
        out_rows = []
        for (rid, wanted, new_pos, g), sel in zip(reqs, pdf["selection"]):
            if "trilateration" in wanted:
                r = _trilat_arrays(g)
                if r is not None:
                    new_pos.append(dict(zip(fields, r), algorithm="trilateration"))
            if "maximum_likelihood" in wanted:
                r = next(mle_results)
                if r is not None:
                    new_pos.append(dict(zip(fields, r), algorithm="maximum_likelihood"))
            out_rows.append((rid, sel, new_pos))
        yield pd.DataFrame(out_rows, columns=["request_id", "selection", "positions"])


# ---------------------------------------------------------------------------
# the one-pass pipeline
# ---------------------------------------------------------------------------

_OBS_FIELDS = (
    "mac_addr",
    "signal_strength",
    "frequency",
    "ap_lat",
    "ap_lon",
    "ap_alt",
    "ap_haccuracy",
    "ap_confidence",
    "ap_vendor",
)


def position_requests_onepass(requests: DataFrame, access_points: DataFrame) -> DataFrame:
    """Nested requests + AP dimension → combined positions, one shuffle.

    Assembly is a chain of projections with NAMED intermediates: each stage's
    expressions reference the previous stage's columns as leaf attributes.
    (Inlining everything into one select is semantically identical but the
    expression tree grows combinatorially — the analyzer OOMs.)
    """
    gated = requests.filter(physics_valid_expr(F.col("wifiScanResults")))
    obs = join_known_aps(explode_requests(gated), access_points)

    packed = obs.groupBy("request_id").agg(
        F.max("n_scanned").alias("n_scanned"),
        F.array_sort(F.collect_list(F.struct(*_OBS_FIELDS))).alias("arr"),
    )

    arr = F.col("arr")
    # keep-first per mac on the (mac, signal, …)-sorted array — deterministic
    # twin of the reference's createAPMap keep-first semantics
    df = packed.withColumn(
        "_ded",
        F.filter(
            arr,
            lambda x, i: (i == 0)
            | (x.getField("mac_addr") != F.element_at(arr, i).getField("mac_addr")),
        ),
    )
    ded = F.col("_ded")

    # stage: one-pass sums (signal stats, WCL/log-distance, pairs) + geometry
    df = df.withColumns(
        {
            "_stats": _signal_stats_col(arr),
            "_ext": _ext_array(arr),
            "_pairs": _pairs_array(arr),
            "_best": F.array_max(
                F.transform(
                    arr,
                    lambda x: F.struct(
                        x.getField("signal_strength").alias("s"),
                        x.getField("mac_addr").alias("m"),
                        x.getField("ap_lat").alias("lat"),
                        x.getField("ap_lon").alias("lon"),
                        x.getField("ap_alt").alias("alt"),
                        x.getField("ap_haccuracy").alias("hacc"),
                    ),
                )
            ),
            **_geometry_stage1(ded),
        }
    )
    df = df.withColumns(
        {
            "_exts": _ext_sums(F.col("_ext")),
            "_prs": _pair_sums(F.col("_pairs")),
            "_n_pairs": F.size(F.col("_pairs")),
            **_signal_context_from_stats(),
            **_geometry_stage1b(),
        }
    )
    df = df.withColumns(_geometry_stage2(ded))
    df = df.withColumns(_geometry_stage3(ded))
    df = df.withColumns(_geometry_stage4())

    # stage: context classes → selection array (CASEs over leaf columns)
    n = F.col("_n_aps")
    df = df.withColumns(
        {
            "_ap_count_class": F.when(n == 1, "SINGLE_AP")
            .when(n == 2, "TWO_APS")
            .when(n == 3, "THREE_APS")
            .otherwise("FOUR_PLUS_APS"),
            "_geometric_quality": F.when(n < 3, "POOR_GDOP")
            .when(F.col("_is_collinear"), "COLLINEAR")
            .when(F.col("_gdop") < C.GDOP_EXCELLENT, "EXCELLENT_GDOP")
            .when(F.col("_gdop") < C.GDOP_GOOD, "GOOD_GDOP")
            .when(F.col("_gdop") < C.GDOP_FAIR, "FAIR_GDOP")
            .otherwise("POOR_GDOP"),
        }
    )
    ctx = {
        "ap_count_class": F.col("_ap_count_class"),
        "signal_quality": F.col("_signal_quality"),
        "signal_distribution": F.col("_signal_distribution"),
        "geometric_quality": F.col("_geometric_quality"),
        "all_very_weak": F.col("_all_very_weak"),
    }
    # one boundary, not two: selection and the closed-form positions are
    # independent, and every DataFrame transformation re-analyzes the whole
    # (large) accumulated plan eagerly
    df = df.withColumns(
        {
            "selection": _selection_array(ctx),
            "_closed": _closed_positions_from_named(arr, F.col("n_scanned")),
        }
    )

    sel = F.col("selection")
    staged = df.select(
        "request_id",
        "_ded",
        "selection",
        # keep only the selected closed-form positions
        F.filter(
            F.col("_closed"),
            lambda p: F.exists(
                sel, lambda e: e.getField("algorithm") == p.getField("algorithm")
            ),
        ).alias("positions"),
        F.exists(
            sel,
            lambda e: e.getField("algorithm").isin("trilateration", "maximum_likelihood"),
        ).alias("_has_numeric"),
    )
    staged = staged.cache()

    plain = staged.filter(~F.col("_has_numeric")).select(
        "request_id", "selection", "positions"
    )
    numeric_in = staged.filter(F.col("_has_numeric")).select(
        "request_id", "selection", "positions", "_ded"
    )
    spark = requests.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism // 2)
    numeric_out = numeric_in.repartition(n_parts).mapInPandas(
        _run_numeric_onepass, _PACKED_SCHEMA
    )

    combined = plain.unionByName(numeric_out)
    # attach selection weights to each computed position; the selection array
    # rides through as calculation_info — the reference's CalculationInfo
    # diagnostics (selected algorithms + final weights per request)
    weighted = combined.select(
        "request_id",
        F.col("selection").alias("calculation_info"),
        F.filter(
            F.transform(
                F.col("positions"),
                lambda p: F.struct(
                    p.getField("algorithm").alias("algorithm"),
                    F.coalesce(
                        F.element_at(
                            F.transform(
                                F.filter(
                                    F.col("selection"),
                                    lambda e: e.getField("algorithm")
                                    == p.getField("algorithm"),
                                ),
                                lambda e: e.getField("weight"),
                            ),
                            1,
                        ),
                        F.lit(0.0),
                    ).alias("weight"),
                    p.getField("latitude").alias("latitude"),
                    p.getField("longitude").alias("longitude"),
                    p.getField("altitude").alias("altitude"),
                    p.getField("accuracy").alias("accuracy"),
                    p.getField("confidence").alias("confidence"),
                ),
            ),
            lambda p: p.getField("weight") > 0.0,
        ).alias("pos"),
    ).filter(F.size("pos") > 0)

    return combine_packed(weighted, "pos", passthrough=("calculation_info",))
