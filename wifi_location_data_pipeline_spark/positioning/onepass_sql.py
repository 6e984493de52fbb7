"""The one-pass positioning middle (packed → staged) as ONE generated SQL.

Why SQL text and not the Column DSL: the DSL builds this tree through
thousands of eagerly analyzed py4j calls — a measured multi-second driver
cost per invocation — while a single spark.sql statement parses and
analyzes once JVM-side. The SQL replicates the Column formulation (kept in
onepass.py docstring history and mirrored by the row-wise phase modules)
expression for expression; the onepass-vs-multipass parity tests and the
golden-range acceptance suites gate any semantic drift.

Structure: chained single-reference CTEs (s1..s12), each layer naming the
aggregates the next layer consumes — the same named-intermediate discipline
the Column version used, because re-inlining the aggregate trees would blow
the expression tree up combinatorially (the selection CASEs alone would
copy the GDOP tree ~30×).
"""

from __future__ import annotations

from wifi_location_data_pipeline_spark import config as C
from wifi_location_data_pipeline_spark.positioning.selection import (
    ALGORITHMS,
    BASE_WEIGHTS,
    DISTRIBUTION_MULT,
    GEOMETRY_MULT,
    SIGNAL_MULT,
)

SINGULARITY = 1e-10
COLLINEARITY_MAX_DEVIATION_DEG = 0.0002

_D0 = "CAST(0.0 AS DOUBLE)"


def _stats_agg() -> str:
    """One-pass signal stats over the full observation array (struct
    accumulator: every sum in one O(K) traversal)."""
    return f"""aggregate(arr,
      named_struct('s_sum', {_D0}, 's_sq', {_D0}, 's_max', CAST(-1e9 AS DOUBLE),
                   'sq_sum', {_D0}, 'hacc_sum', {_D0}, 'hacc_n', {_D0}),
      (a, x) -> named_struct(
        's_sum', a.s_sum + x.signal_strength,
        's_sq', a.s_sq + x.signal_strength * x.signal_strength,
        's_max', greatest(a.s_max, x.signal_strength),
        'sq_sum', a.sq_sum + least(CAST(1.0 AS DOUBLE),
                    greatest({_D0}, (x.signal_strength + 95.0) / 45.0)),
        'hacc_sum', a.hacc_sum + coalesce(x.ap_haccuracy, {_D0}),
        'hacc_n', a.hacc_n + CASE WHEN x.ap_haccuracy IS NOT NULL THEN 1.0 ELSE 0.0 END))"""


def _ext_transform() -> str:
    """Per-element derived values for WCL + log-distance (vendor path-loss n,
    signal-adjusted clamp, band reference RSSI, shadow sigma, distance,
    inverse-distance weight, confidence weight, WCL weight)."""
    vend = "lower(trim(x.ap_vendor))"
    vendor_n = f"""CASE {vend}
        WHEN 'cisco' THEN 3.0 WHEN 'aruba' THEN 2.8 WHEN 'meraki' THEN 3.0
        WHEN 'ubiquiti' THEN 2.7 WHEN 'ruckus' THEN 2.9 WHEN 'hpe-aruba' THEN 2.8
        ELSE {C.DEFAULT_PATH_LOSS_EXPONENT} END"""
    n_adj = f"""CASE
        WHEN x.signal_strength >= -50.0
          THEN ({vendor_n}) - least(CAST(1.0 AS DOUBLE), (x.signal_strength + 50.0) / 5.0)
        WHEN x.signal_strength <= -80.0
          THEN ({vendor_n}) + least(CAST(1.5 AS DOUBLE), (-80.0 - x.signal_strength) / 5.0)
        ELSE ({vendor_n}) END"""
    nn = f"greatest(CAST({C.PATH_LOSS_EXPONENT_MIN} AS DOUBLE), least(CAST({C.PATH_LOSS_EXPONENT_MAX} AS DOUBLE), {n_adj}))"
    ref = f"""CASE WHEN x.frequency >= 5000 THEN {C.REF_RSSI_5GHZ}
        WHEN x.frequency >= 2400 THEN {C.REF_RSSI_2_4GHZ}
        ELSE {C.REF_RSSI_6GHZ} END"""
    sigma = f"""CASE WHEN x.signal_strength >= -50.0 THEN {C.SHADOW_SIGMA_LOW}
        WHEN x.signal_strength <= -80.0 THEN {C.SHADOW_SIGMA_HIGH}
        ELSE {C.SHADOW_SIGMA_MEDIUM} END"""
    dist = f"power(CAST(10.0 AS DOUBLE), (({ref}) - x.signal_strength) / (10.0 * ({nn}))) * (1.0 + ({sigma}) / 10.0)"
    wcl_w = (
        "power(CAST(10.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE), "
        "least(CAST(1.0 AS DOUBLE), (x.signal_strength - (-30.0)) / (-100.0 - (-30.0)))))"
    )
    cw = f"""greatest(CAST(0.6 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
        (1.0 / (1.0 + exp(-4.0 * ((x.signal_strength + 100.0) / 70.0 - 0.5))))
        * greatest(CAST(0.7 AS DOUBLE), coalesce(x.ap_confidence, CAST(0.85 AS DOUBLE)))
        * CASE WHEN x.ap_vendor IS NOT NULL THEN 1.2 ELSE 0.85 END))"""
    return f"""transform(arr, x -> named_struct(
      'lat', x.ap_lat, 'lon', x.ap_lon, 'alt', x.ap_alt,
      'd', {dist},
      'iw', 1.0 / greatest(CAST(1.0 AS DOUBLE), {dist}),
      'cw', {cw},
      'w', {wcl_w}))"""


def _pairs_expr() -> str:
    """RSSI-ratio pair values: mac-sorted array positions i<j, distinct macs
    (the m1<m2 join semantics of the row-wise rssi_ratio)."""
    ratio = f"power(CAST(10.0 AS DOUBLE), (p.a.signal_strength - p.b.signal_strength) / {C.RSSI_RATIO_EXPONENT_DIVISOR})"

    def interp(fld: str) -> str:
        return f"(p.a.{fld} + ({ratio}) * p.b.{fld}) / (1.0 + ({ratio}))"

    return f"""transform(
      filter(
        flatten(transform(arr, (x, i) ->
          transform(slice(arr, i + 2, greatest(size(arr) - (i + 1), 0)),
                    y -> named_struct('a', x, 'b', y)))),
        p -> p.a.mac_addr != p.b.mac_addr),
      p -> named_struct(
        'pw', abs(p.a.signal_strength - p.b.signal_strength) / 30.0,
        'plat', {interp('ap_lat')},
        'plon', {interp('ap_lon')},
        'has_alt', p.a.ap_alt IS NOT NULL AND p.b.ap_alt IS NOT NULL,
        'palt', {interp('ap_alt')}))"""


def _ext_sums() -> str:
    """Every WCL + log-distance aggregate in ONE traversal of _ext."""
    return f"""aggregate(_ext,
      named_struct('sw', {_D0}, 'swlat', {_D0}, 'swlon', {_D0}, 'swaltn', {_D0},
                   'swaltd', {_D0}, 'altn', {_D0}, 'siw', {_D0}, 'silat', {_D0},
                   'silon', {_D0}, 'sialtn', {_D0}, 'sialtd', {_D0},
                   'mind', CAST('Infinity' AS DOUBLE), 'maxd', CAST('-Infinity' AS DOUBLE),
                   'scw', {_D0}),
      (a, x) -> named_struct(
        'sw', a.sw + x.w,
        'swlat', a.swlat + x.lat * x.w,
        'swlon', a.swlon + x.lon * x.w,
        'swaltn', a.swaltn + CASE WHEN x.alt IS NOT NULL THEN x.alt * x.w ELSE 0.0 END,
        'swaltd', a.swaltd + CASE WHEN x.alt IS NOT NULL THEN x.w ELSE 0.0 END,
        'altn', a.altn + CASE WHEN x.alt IS NOT NULL THEN 1.0 ELSE 0.0 END,
        'siw', a.siw + x.iw,
        'silat', a.silat + x.lat * x.iw,
        'silon', a.silon + x.lon * x.iw,
        'sialtn', a.sialtn + CASE WHEN x.alt IS NOT NULL THEN x.alt * x.iw ELSE 0.0 END,
        'sialtd', a.sialtd + CASE WHEN x.alt IS NOT NULL THEN x.iw ELSE 0.0 END,
        'mind', least(a.mind, x.d),
        'maxd', greatest(a.maxd, x.d),
        'scw', a.scw + x.cw))"""


def _pair_sums() -> str:
    return f"""aggregate(_pairs,
      named_struct('spw', {_D0}, 'splat', {_D0}, 'splon', {_D0},
                   'saltn', {_D0}, 'saltd', {_D0}),
      (a, p) -> named_struct(
        'spw', a.spw + p.pw,
        'splat', a.splat + p.plat * p.pw,
        'splon', a.splon + p.plon * p.pw,
        'saltn', a.saltn + CASE WHEN p.has_alt THEN p.palt * p.pw ELSE 0.0 END,
        'saltd', a.saltd + CASE WHEN p.has_alt THEN p.pw ELSE 0.0 END))"""


def _weight_case(table: dict[str, tuple[float, ...]], class_col: str, algo: str) -> str:
    i = ALGORITHMS.index(algo)
    whens = " ".join(f"WHEN '{k}' THEN CAST({float(m[i])} AS DOUBLE)" for k, m in table.items())
    return f"CASE {class_col} {whens} END"


def _selection_aw() -> str:
    """(algorithm, weight) literal array: weight = base × signal × geometry ×
    distribution CASE products per algorithm."""
    entries = []
    for algo in ALGORITHMS:
        w = " * ".join(
            [
                f"({_weight_case(BASE_WEIGHTS, '_ap_count_class', algo)})",
                f"({_weight_case(SIGNAL_MULT, '_signal_quality', algo)})",
                f"({_weight_case(GEOMETRY_MULT, '_geometric_quality', algo)})",
                f"({_weight_case(DISTRIBUTION_MULT, '_signal_distribution', algo)})",
            ]
        )
        entries.append(f"named_struct('algorithm', '{algo}', 'weight', {w})")
    return f"array({', '.join(entries)})"


def _selection_final() -> str:
    """Sorted, thresholded, top-K'd selection with the very-weak override."""
    cmp = """(x, y) -> CASE WHEN x.weight > y.weight THEN -1
        WHEN x.weight < y.weight THEN 1
        ELSE CASE WHEN x.algorithm < y.algorithm THEN -1
                  WHEN x.algorithm > y.algorithm THEN 1 ELSE 0 END END"""
    ranked = f"array_sort(filter(_aw, x -> x.weight > 0.0), {cmp})"
    k = (
        f"CASE WHEN element_at(transform({ranked}, x -> x.weight), 1) > "
        f"{C.SELECTION_STRONG_MAX_WEIGHT} THEN {C.SELECTION_TOP_K_STRONG} "
        f"ELSE {C.SELECTION_TOP_K_DEFAULT} END"
    )
    kept = (
        f"filter({ranked}, (x, i) -> "
        f"(x.weight >= {C.SELECTION_MIN_WEIGHT} AND i < ({k})) OR i = 0)"
    )
    prox_w = (
        "greatest(coalesce(element_at(transform("
        "filter(_aw, x -> x.algorithm = 'proximity'), x -> x.weight), 1), "
        f"{_D0}), CAST(0.5 AS DOUBLE))"
    )
    weak = f"array(named_struct('algorithm', 'proximity', 'weight', {prox_w}))"
    return (
        "CASE WHEN _all_very_weak OR _signal_quality = 'VERY_WEAK_SIGNAL' "
        f"THEN {weak} ELSE {kept} END"
    )


def _closed_expr() -> str:
    """[proximity, weighted_centroid, log_distance, rssi_ratio?] from the
    named single-pass aggregates."""
    nd = "_nd"
    prox = f"""named_struct(
      'algorithm', 'proximity',
      'latitude', _best.lat, 'longitude', _best.lon,
      'altitude', coalesce(_best.alt, {_D0}),
      'accuracy', coalesce(_best.hacc, CAST({C.PROXIMITY_DEFAULT_ACCURACY_M} AS DOUBLE)),
      'confidence', greatest({_D0}, least(CAST({C.PROXIMITY_CONF_MAX} AS DOUBLE),
                     (_best.s + 90.0) / 60.0)))"""
    avg_acc = "CASE WHEN _stats.hacc_n > 0.0 THEN _stats.hacc_sum / _stats.hacc_n END"
    coverage = f"{nd} / greatest(CAST(n_scanned AS DOUBLE), CAST(1.0 AS DOUBLE))"
    wcl = f"""named_struct(
      'algorithm', 'weighted_centroid',
      'latitude', _exts.swlat / _exts.sw, 'longitude', _exts.swlon / _exts.sw,
      'altitude', coalesce(try_divide(
          CASE WHEN _exts.altn > 0.0 THEN _exts.swaltn END,
          CASE WHEN _exts.altn > 0.0 THEN _exts.swaltd END), {_D0}),
      'accuracy', coalesce({avg_acc}, CAST({C.WCL_DEFAULT_AP_ACCURACY_M} AS DOUBLE)),
      'confidence', least(CAST({C.WCL_CONF_CAP} AS DOUBLE),
                     ({coverage}) * CAST({C.WCL_CONF_COVERAGE_COEF} AS DOUBLE)))"""
    avg_s = f"(_stats.s_sum / {nd})"
    sr = f"(({avg_s}) - (-80.0)) / ((-50.0) - (-80.0))"
    ld_acc = f"""CASE WHEN {avg_s} >= -50.0 THEN _exts.mind * 0.5
        WHEN {avg_s} <= -80.0 THEN _exts.maxd * 3.0
        ELSE (_exts.mind + _exts.maxd) / 2.0 * (3.0 - ({sr}) * 2.5) END"""
    ld = f"""named_struct(
      'algorithm', 'log_distance',
      'latitude', _exts.silat / _exts.siw, 'longitude', _exts.silon / _exts.siw,
      'altitude', coalesce(try_divide(
          CASE WHEN _exts.sialtd > 0.0 THEN _exts.sialtn END,
          CASE WHEN _exts.sialtd > 0.0 THEN _exts.sialtd END), {_D0}),
      'accuracy', {ld_acc},
      'confidence', least(CAST(0.85 AS DOUBLE), _exts.scw / {nd}))"""
    sq = f"(_stats.sq_sum / {nd})"
    signal_factor = (
        f"greatest(CAST(1.0 AS DOUBLE), least(CAST(3.0 AS DOUBLE), (-({avg_s}) - 50.0) / 10.0))"
    )
    base_conf = f"least(CAST(0.85 AS DOUBLE), _prs.spw / ({nd} * ({nd} - 1.0) / 2.0))"
    rr_conf = f"least(CAST(0.85 AS DOUBLE), ({base_conf}) + ({sq}))"
    rr_conf = (
        f"CASE WHEN {avg_s} >= -70.0 THEN greatest(CAST(0.7 AS DOUBLE), {rr_conf}) "
        f"ELSE {rr_conf} END"
    )
    rr = f"""named_struct(
      'algorithm', 'rssi_ratio',
      'latitude', _prs.splat / _prs.spw, 'longitude', _prs.splon / _prs.spw,
      'altitude', coalesce(try_divide(
          CASE WHEN _prs.saltd > 0.0 THEN _prs.saltn END,
          CASE WHEN _prs.saltd > 0.0 THEN _prs.saltd END), {_D0}),
      'accuracy', coalesce({avg_acc}, CAST(15.0 AS DOUBLE)) * ({signal_factor}),
      'confidence', {rr_conf})"""
    return f"""CASE WHEN _nd >= 2.0 AND _n_pairs > 0
             AND _prs.spw IS NOT NULL AND _prs.spw > 0.0
        THEN concat(array({prox}, {wcl}, {ld}), array({rr}))
        ELSE array({prox}, {wcl}, {ld}) END"""


def staged_sql(view: str) -> str:
    """packed view (request_id, n_scanned, arr) → staged projection
    (request_id, _ded, _ctx, selection, positions, _has_numeric); ``_ctx``
    packs the four context classes + the very-weak flag so the service
    tier can attach the reference's selection reason strings
    (SelectionContext, SelectionContextBuilder.java:28-47) by a
    480-combination broadcast dimension — no per-request recomputation.

    Emitted as NESTED SUBQUERIES, not a WITH chain: a cached DataFrame whose
    plan contains a WithCTE node misses cache substitution downstream
    (Spark 4.1 inlines CTEs after the substitution pass — same gotcha as the
    MinHash pipeline), and without substitution the consumer's optimizer
    re-collapses this entire expression tree combinatorially. Nested
    subqueries produce plain Project nodes, so ``staged.cache()`` protects
    every downstream reference.

    Each layer lists its carried columns EXPLICITLY instead of SELECT * —
    the packed array ``arr`` and the wide intermediates (_ext, _pairs, _g1,
    _cov, _gram) drop as soon as their consumers have run. With SELECT *
    they rode through all twelve layers and the analyzer re-resolved the
    full (and largest-possible) projection at every level: measured ~1.7 s
    of driver-side analysis per invocation at sf0.1, roughly halved by the
    explicit carries."""
    nd = "_nd"
    g1 = f"""aggregate(_ded,
      named_struct('lat', {_D0}, 'lon', {_D0}, 'w', {_D0}, 'wlat', {_D0}, 'wlon', {_D0}),
      (a, x) -> named_struct(
        'lat', a.lat + x.ap_lat,
        'lon', a.lon + x.ap_lon,
        'w', a.w + power(CAST(10.0 AS DOUBLE), greatest({_D0},
               least(CAST(1.0 AS DOUBLE), (x.signal_strength + 30.0) / (-70.0)))),
        'wlat', a.wlat + x.ap_lat * power(CAST(10.0 AS DOUBLE), greatest({_D0},
               least(CAST(1.0 AS DOUBLE), (x.signal_strength + 30.0) / (-70.0)))),
        'wlon', a.wlon + x.ap_lon * power(CAST(10.0 AS DOUBLE), greatest({_D0},
               least(CAST(1.0 AS DOUBLE), (x.signal_strength + 30.0) / (-70.0))))))"""
    cov = f"""aggregate(_ded,
      named_struct('ll', {_D0}, 'oo', {_D0}, 'lo', {_D0}),
      (a, x) -> named_struct(
        'll', a.ll + (x.ap_lat - _mean_lat) * (x.ap_lat - _mean_lat),
        'oo', a.oo + (x.ap_lon - _mean_lon) * (x.ap_lon - _mean_lon),
        'lo', a.lo + (x.ap_lat - _mean_lat) * (x.ap_lon - _mean_lon)))"""
    dx = "((x.ap_lon - _est_lon) * 111000.0 * cos(radians(_est_lat)))"
    dy = "((x.ap_lat - _est_lat) * 111000.0)"
    r = f"greatest(sqrt({dx} * {dx} + {dy} * {dy}), CAST(1e-9 AS DOUBLE))"
    gram = f"""aggregate(_ded,
      named_struct('a', {_D0}, 'b', {_D0}, 'c', {_D0}),
      (a, x) -> named_struct(
        'a', a.a + ({dx} / ({r})) * ({dx} / ({r})),
        'b', a.b + ({dx} / ({r})) * ({dy} / ({r})),
        'c', a.c + ({dy} / ({r})) * ({dy} / ({r}))))"""
    gdop_raw = "sqrt(try_divide(_gram.a + _gram.c, _gram.a * _gram.c - _gram.b * _gram.b))"
    base = "request_id, n_scanned, _ded, _nd, _stats, _best"
    layers = [
        f"""SELECT request_id, n_scanned, arr,
    filter(arr, (x, i) -> i = 0 OR x.mac_addr != element_at(arr, i).mac_addr) AS _ded
  FROM {view}""",
        f"""SELECT request_id, n_scanned, _ded,
    CAST(size(arr) AS DOUBLE) AS _nd,
    {_stats_agg()} AS _stats,
    {_ext_transform()} AS _ext,
    {_pairs_expr()} AS _pairs,
    array_max(transform(arr, x -> named_struct(
      's', x.signal_strength, 'm', x.mac_addr, 'lat', x.ap_lat,
      'lon', x.ap_lon, 'alt', x.ap_alt, 'hacc', x.ap_haccuracy))) AS _best,
    CAST(size(_ded) AS DOUBLE) AS _n_aps,
    {g1} AS _g1""",
        f"""SELECT {base}, _n_aps,
    {_ext_sums()} AS _exts,
    {_pair_sums()} AS _prs,
    size(_pairs) AS _n_pairs,
    _stats.s_sum / {nd} AS _avg_rssi,
    _g1.lat / _n_aps AS _mean_lat,
    _g1.lon / _n_aps AS _mean_lon,
    _g1.wlat / _g1.w AS _est_lat,
    _g1.wlon / _g1.w AS _est_lon""",
        f"""SELECT {base}, _n_aps, _exts, _prs, _n_pairs, _avg_rssi, _mean_lat, _mean_lon,
    sqrt(CASE WHEN {nd} > 1.0
         THEN greatest({_D0}, (_stats.s_sq - {nd} * _avg_rssi * _avg_rssi) / ({nd} - 1.0))
         ELSE 0.0 END) AS _sd,
    {cov} AS _cov,
    {gram} AS _gram""",
        f"""SELECT {base}, _n_aps, _exts, _prs, _n_pairs, _avg_rssi, _mean_lat, _mean_lon,
    _cov.ll / _n_aps AS _cov_ll, _cov.oo / _n_aps AS _cov_oo, _cov.lo / _n_aps AS _cov_lo,
    CASE WHEN _avg_rssi > {C.SIGNAL_STRONG_DBM} THEN 'STRONG_SIGNAL'
         WHEN _avg_rssi > {C.SIGNAL_MEDIUM_DBM} THEN 'MEDIUM_SIGNAL'
         WHEN _avg_rssi > {C.SIGNAL_WEAK_DBM} THEN 'WEAK_SIGNAL'
         ELSE 'VERY_WEAK_SIGNAL' END AS _signal_quality,
    CASE WHEN _sd > {C.DISTRIBUTION_OUTLIER_STDDEV} THEN 'SIGNAL_OUTLIERS'
         WHEN _sd > {C.DISTRIBUTION_MIXED_STDDEV} THEN 'MIXED_SIGNALS'
         ELSE 'UNIFORM_SIGNALS' END AS _signal_distribution,
    _stats.s_max < {C.ALL_WEAK_RSSI_GATE} AS _all_very_weak,
    CASE WHEN _n_aps < 3 THEN CAST({C.GDOP_MAX} AS DOUBLE)
         ELSE CASE WHEN abs(_gram.a * _gram.c - _gram.b * _gram.b) < {SINGULARITY}
                   THEN CAST({C.GDOP_MAX} AS DOUBLE)
                   ELSE coalesce(least(CAST({C.GDOP_MAX} AS DOUBLE), {gdop_raw}),
                                 CAST({C.GDOP_MAX} AS DOUBLE)) END END AS _gdop""",
        f"""SELECT {base}, _n_aps, _exts, _prs, _n_pairs, _avg_rssi, _mean_lat, _mean_lon,
    _cov_ll, _cov_oo, _signal_quality, _signal_distribution, _all_very_weak, _gdop,
    try_divide(_cov_lo, _cov_oo) AS _slope""",
        f"""SELECT {base}, _n_aps, _exts, _prs, _n_pairs, _avg_rssi,
    _cov_ll, _cov_oo, _signal_quality, _signal_distribution, _all_very_weak, _gdop, _slope,
    _mean_lat - _slope * _mean_lon AS _intercept""",
        f"""SELECT {base}, _n_aps, _exts, _prs, _n_pairs, _avg_rssi,
    _signal_quality, _signal_distribution, _all_very_weak, _gdop,
    (_n_aps >= 3) AND (
      _cov_ll < {SINGULARITY} OR _cov_oo < {SINGULARITY}
      OR coalesce(array_max(transform(_ded,
           x -> abs(x.ap_lat - (_slope * x.ap_lon + _intercept)))), {_D0})
         <= {COLLINEARITY_MAX_DEVIATION_DEG}) AS _is_collinear""",
        f"""SELECT {base}, _exts, _prs, _n_pairs, _avg_rssi,
    _signal_quality, _signal_distribution, _all_very_weak,
    CASE WHEN _n_aps = 1 THEN 'SINGLE_AP'
         WHEN _n_aps = 2 THEN 'TWO_APS'
         WHEN _n_aps = 3 THEN 'THREE_APS'
         ELSE 'FOUR_PLUS_APS' END AS _ap_count_class,
    CASE WHEN _n_aps < 3 THEN 'POOR_GDOP'
         WHEN _is_collinear THEN 'COLLINEAR'
         WHEN _gdop < {C.GDOP_EXCELLENT} THEN 'EXCELLENT_GDOP'
         WHEN _gdop < {C.GDOP_GOOD} THEN 'GOOD_GDOP'
         WHEN _gdop < {C.GDOP_FAIR} THEN 'FAIR_GDOP'
         ELSE 'POOR_GDOP' END AS _geometric_quality""",
        f"""SELECT {base}, _exts, _prs, _n_pairs, _avg_rssi,
    _signal_quality, _all_very_weak,
    named_struct(
      'ap_count_class', _ap_count_class,
      'signal_quality', _signal_quality,
      'geometric_quality', _geometric_quality,
      'signal_distribution', _signal_distribution,
      'all_very_weak', _all_very_weak) AS _ctx,
    {_selection_aw()} AS _aw""",
        f"""SELECT request_id, _ded, _ctx,
    {_selection_final()} AS selection,
    {_closed_expr()} AS _closed""",
        """SELECT request_id, _ded, _ctx, selection,
    filter(_closed, p -> exists(selection, e -> e.algorithm = p.algorithm)) AS positions,
    exists(selection, e -> e.algorithm IN ('trilateration', 'maximum_likelihood'))
      AS _has_numeric""",
    ]
    sql = layers[0]
    for i, layer in enumerate(layers[1:], start=1):
        sql = f"{layer}\n  FROM (\n{sql}\n) s{i}"
    return sql
