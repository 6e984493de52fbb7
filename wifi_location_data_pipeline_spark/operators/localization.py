"""Maturity-tiered batch AP localization (SURVEY.md §2.9/§3.3).

Implements the FRAMEWORK doc's algorithm-selection matrix (Table 2, doc
:121-169) — the layer that is *stubbed* in the reference code
(wifi-data-pipeline-computation/.../algorithm/impl/*.java return null):

- Tier 1 (20 ≤ N < 50):  Weighted Centroid with w = quality_w · 10^(RSSI/10)
- Tier 2 (50 ≤ N < 100): Maximum Likelihood on the log-distance model,
  tier-specific parameters: CONNECTED rows get a precise path-loss exponent
  (from frequency) and low σ; SCAN rows a generic n and high σ
- Tier 3 (N ≥ 100):      Bayesian/MLE with prior — the prior state (x̂, P)
  fuses via the Kalman update in ``kalman_update`` (doc :172-213)

Spark shape (§3.3): the reference's SQS-message-per-MAC orchestration
disappears — ONE job localizes every sufficient BSSID in a single groupBy.
The WCL tier is a pure SQL aggregate; the MLE tier is applyInPandas over only
the BSSIDs routed to it (tier routing via a CASE + semi-join, so the Python
hop sees the minimal rows). Skew note: a mega-popular BSSID is capped by
per-group sampling (``max_rows_per_ap``) before the Python tier, mirroring the
reference's per-query LIMIT (APMeasurementsLookUpService :140-157).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wifi_location_data_pipeline_spark import config as C

AP_LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("bssid", T.StringType()),
        T.StructField("algorithm", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("altitude", T.DoubleType()),
        T.StructField("horizontal_accuracy", T.DoubleType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("measurement_count", T.LongType()),
    ]
)

METERS_PER_DEG = 111_000.0


def tier_routing(measurements: DataFrame, cfg: C.EngineConfig = C.DEFAULT_CONFIG) -> DataFrame:
    """(bssid, n, tier) for clean measurements; below-bootstrap APs excluded."""
    counts = (
        measurements.filter(~F.coalesce(F.col("is_global_outlier"), F.lit(False)))
        .groupBy("bssid")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= cfg.localization_min_measurements)
    )
    return counts.withColumn(
        "tier",
        F.when(F.col("n") < C.LOCALIZATION_TIER_MLE, "WCL")
        .when(F.col("n") < C.LOCALIZATION_TIER_BAYESIAN, "MLE")
        .otherwise("BAYESIAN"),
    )


def wcl_localize(measurements: DataFrame) -> DataFrame:
    """Tier-1 weighted centroid: w = quality_w · 10^(RSSI/10) (doc :133-139)."""
    w = F.col("quality_weight") * F.pow(10.0, F.col("rssi").cast("double") / 10.0)
    agg = measurements.withColumn("_w", w).groupBy("bssid").agg(
        (F.sum(F.col("latitude") * F.col("_w")) / F.sum("_w")).alias("latitude"),
        (F.sum(F.col("longitude") * F.col("_w")) / F.sum("_w")).alias("longitude"),
        (
            F.sum(F.when(F.col("altitude").isNotNull(), F.col("altitude") * F.col("_w")))
            / F.sum(F.when(F.col("altitude").isNotNull(), F.col("_w")))
        ).alias("altitude"),
        F.count("*").alias("measurement_count"),
        F.stddev_samp("latitude").alias("_slat"),
        F.stddev_samp("longitude").alias("_slon"),
    )
    # accuracy from the cloud's spatial spread; confidence grows with N
    spread_m = F.sqrt(
        F.pow(F.coalesce(F.col("_slat"), F.lit(0.0)) * METERS_PER_DEG, 2)
        + F.pow(F.coalesce(F.col("_slon"), F.lit(0.0)) * METERS_PER_DEG * 0.766, 2)
    )
    return agg.select(
        "bssid",
        F.lit("WCL").alias("algorithm"),
        "latitude",
        "longitude",
        "altitude",
        F.greatest(F.lit(5.0), spread_m / F.sqrt(F.col("measurement_count"))).alias(
            "horizontal_accuracy"
        ),
        F.least(F.lit(0.8), 0.3 + 0.01 * F.col("measurement_count")).alias("confidence"),
        F.col("measurement_count").cast("long").alias("measurement_count"),
    )


def _mle_localize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped MLE on the log-distance model with tier-specific n/σ per row.

    CONNECTED rows: frequency-derived n (2.8 for 5 GHz, 3.0 for 2.4 GHz) and
    σ = 2.5 dB; SCAN rows: generic n = 3.0, σ = 6.0 dB (doc :147-160).
    """
    bssid = pdf["bssid"].iloc[0]
    lat = pdf["latitude"].to_numpy(float)
    lon = pdf["longitude"].to_numpy(float)
    rssi = pdf["rssi"].to_numpy(float)
    qw = pdf["quality_weight"].fillna(1.0).to_numpy(float)
    connected = (pdf["connection_status"] == "CONNECTED").to_numpy()
    freq = pdf["frequency"].fillna(2437).to_numpy(float)

    n_exp = np.where(connected, np.where(freq >= 5000, 2.8, 3.0), 3.0)
    sigma = np.where(connected, 2.5, 6.0)
    ref = np.where(freq >= 5000, -45.0, -40.0)

    lat0, lon0 = float(np.mean(lat)), float(np.mean(lon))
    coslat = math.cos(math.radians(lat0))
    x = (lon - lon0) * METERS_PER_DEG * coslat
    y = (lat - lat0) * METERS_PER_DEG

    # init at the tier-1 WCL estimate
    w0 = qw * np.power(10.0, rssi / 10.0)
    px, py = float(np.sum(x * w0) / np.sum(w0)), float(np.sum(y * w0) / np.sum(w0))

    def ll(px_, py_):
        d = np.maximum(np.hypot(x - px_, y - py_), 1.0)
        err = rssi - (ref - 10.0 * n_exp * np.log10(d))
        return float(np.sum(-(err**2) / (2.0 * sigma**2) * qw))

    def grad(px_, py_):
        d = np.maximum(np.hypot(x - px_, y - py_), 1.0)
        err = rssi - (ref - 10.0 * n_exp * np.log10(d))
        k = err / (sigma**2) * qw * (10.0 * n_exp / math.log(10.0)) / (d**2)
        return float(np.sum(k * (x - px_))), float(np.sum(k * (y - py_)))

    best, best_ll, cur, lr = (px, py), ll(px, py), (px, py), 1.0
    for _ in range(C.MLE_MAX_ITERATIONS):
        gx, gy = grad(*cur)
        gn = math.hypot(gx, gy)
        if gn < 1e-12:
            break
        step = (cur[0] + lr * gx / gn, cur[1] + lr * gy / gn)
        v = ll(*step)
        if v > best_ll:
            best_ll, best, cur = v, step, step
            lr *= 1.2
        else:
            lr *= 0.5
        if lr < C.MLE_CONVERGENCE_M:
            break

    px, py = best
    d = np.maximum(np.hypot(x - px, y - py), 1.0)
    err = rssi - (ref - 10.0 * n_exp * np.log10(d))
    resid = float(np.sqrt(np.mean(err**2)))
    n = len(pdf)
    accuracy = max(3.0, resid * 2.0)
    confidence = min(0.95, 0.5 + 0.002 * n + (0.2 if connected.mean() > 0.3 else 0.0))

    alts = pdf["altitude"].dropna()
    return pd.DataFrame(
        [[
            bssid,
            "MLE",
            lat0 + py / METERS_PER_DEG,
            lon0 + px / (METERS_PER_DEG * coslat),
            float(alts.mean()) if len(alts) else None,
            accuracy,
            confidence,
            n,
        ]],
        columns=[f.name for f in AP_LOCATION_SCHEMA.fields],
    )


def _mle_localize_batch(groups: list[dict]) -> list[list]:
    """Lockstep-vectorized twin of ``_mle_localize_group`` across many APs.

    Same batching rationale as positioning/numeric._mle_batch: the ~100
    gradient iterations per AP dominate when run sequentially per group.
    Padded (R×K) tensors with per-AP learning rates and convergence masks;
    element-wise ops keep per-AP math identical to the sequential reference.

    Bayesian tier (doc :163-169): a group may carry ``prior`` =
    (lat, lon, p_var_m2) — the AP's persisted state (x̂, P). The objective
    becomes the log-posterior: log-likelihood plus the Gaussian log-prior
    −(‖pos − x̂‖²)/(2P) in the local meter frame, i.e. MAP estimation. With
    no prior the extra term is zero and the math is exactly the MLE tier.
    """
    R = len(groups)
    K = max(len(g["rssi"]) for g in groups)
    rssi = np.zeros((R, K))
    qw = np.zeros((R, K))  # padding weight 0 → zero ll/grad contribution
    n_exp = np.full((R, K), 3.0)
    sigma = np.ones((R, K))
    ref = np.zeros((R, K))
    ax = np.zeros((R, K))
    ay = np.zeros((R, K))
    valid = np.zeros((R, K), dtype=bool)
    lat0 = np.zeros(R)
    lon0 = np.zeros(R)
    coslat = np.ones(R)
    ppx = np.zeros(R)  # prior mean in the local meter frame
    ppy = np.zeros(R)
    ipv = np.zeros(R)  # 1/P (prior precision); 0 = no prior = plain MLE

    for r, g in enumerate(groups):
        k = len(g["rssi"])
        rssi[r, :k] = g["rssi"]
        qw[r, :k] = np.where(np.isnan(g["qw"]), 1.0, g["qw"])
        connected = g["connected"]
        freq = np.where(np.isnan(g["freq"]), 2437.0, g["freq"])
        n_exp[r, :k] = np.where(connected, np.where(freq >= 5000, 2.8, 3.0), 3.0)
        sigma[r, :k] = np.where(connected, 2.5, 6.0)
        ref[r, :k] = np.where(freq >= 5000, -45.0, -40.0)
        la, lo = g["lat"], g["lon"]
        lat0[r], lon0[r] = float(np.mean(la)), float(np.mean(lo))
        coslat[r] = math.cos(math.radians(lat0[r]))
        ax[r, :k] = (lo - lon0[r]) * METERS_PER_DEG * coslat[r]
        ay[r, :k] = (la - lat0[r]) * METERS_PER_DEG
        valid[r, :k] = True
        prior = g.get("prior")
        if prior is not None:
            p_lat, p_lon, p_var = prior
            ppx[r] = (p_lon - lon0[r]) * METERS_PER_DEG * coslat[r]
            ppy[r] = (p_lat - lat0[r]) * METERS_PER_DEG
            ipv[r] = 1.0 / max(float(p_var), 1.0)

    w0 = np.where(valid, qw * np.power(10.0, rssi / 10.0), 0.0)
    sw0 = np.maximum(w0.sum(axis=1), 1e-300)
    px = (ax * w0).sum(axis=1) / sw0
    py = (ay * w0).sum(axis=1) / sw0
    kgrad = 10.0 * n_exp / math.log(10.0)

    # Working-set ascent with compaction + (d, err) reuse between the
    # likelihood and gradient evaluations — same rework as
    # positioning/numeric._mle_batch, bit-identical per AP (element-wise
    # ops; valid is exactly 0/1 so folding it into qv is exact). Without
    # compaction the loop runs all iterations at full width for the
    # slowest straggler AP.
    sig2 = sigma**2
    two_sig2 = 2.0 * sigma**2
    qv = qw * valid

    best_x_full, best_y_full = px.copy(), py.copy()
    widx = np.arange(R)
    ax_w, ay_w, rssi_w, ref_w, nexp_w = ax, ay, rssi, ref, n_exp
    sig2_w, two_sig2_w, qv_w, kgrad_w = sig2, two_sig2, qv, kgrad
    ppx_w, ppy_w, ipv_w = ppx, ppy, ipv
    cur_x, cur_y = px.copy(), py.copy()
    best_x, best_y = px.copy(), py.copy()

    def eval_point(x, y):
        d = np.maximum(np.hypot(ax_w - x[:, None], ay_w - y[:, None]), 1.0)
        err = rssi_w - (ref_w - 10.0 * nexp_w * np.log10(d))
        ll = np.sum(-(err**2) / two_sig2_w * qv_w, axis=1)
        # Gaussian log-prior (zero when ipv=0): MAP = MLE + prior pull
        ll = ll - 0.5 * ipv_w * ((x - ppx_w) ** 2 + (y - ppy_w) ** 2)
        return d, err, ll

    d_cur, err_cur, best_ll = eval_point(cur_x, cur_y)
    lr = np.ones(R)
    frozen = np.zeros(R, dtype=bool)
    for _ in range(C.MLE_MAX_ITERATIONS):
        kk = err_cur / sig2_w * qv_w * kgrad_w / (d_cur**2)
        gx = np.sum(kk * (ax_w - cur_x[:, None]), axis=1) + ipv_w * (ppx_w - cur_x)
        gy = np.sum(kk * (ay_w - cur_y[:, None]), axis=1) + ipv_w * (ppy_w - cur_y)
        gn = np.hypot(gx, gy)
        dead = ~frozen & (gn < 1e-12)
        safe = np.where(gn > 0, gn, 1.0)
        step_x = cur_x + lr * gx / safe
        step_y = cur_y + lr * gy / safe
        d_s, err_s, ll = eval_point(step_x, step_y)
        improved = ~frozen & ~dead & (ll > best_ll)
        best_ll = np.where(improved, ll, best_ll)
        best_x = np.where(improved, step_x, best_x)
        best_y = np.where(improved, step_y, best_y)
        cur_x = np.where(improved, step_x, cur_x)
        cur_y = np.where(improved, step_y, cur_y)
        imp2 = improved[:, None]
        d_cur = np.where(imp2, d_s, d_cur)
        err_cur = np.where(imp2, err_s, err_cur)
        lr = np.where(frozen | dead, lr, np.where(improved, lr * 1.2, lr * 0.5))
        frozen |= dead | (lr < C.MLE_CONVERGENCE_M)
        n_frozen = int(frozen.sum())
        if n_frozen == len(widx):
            break
        if n_frozen * 8 >= len(widx):
            done = frozen
            best_x_full[widx[done]] = best_x[done]
            best_y_full[widx[done]] = best_y[done]
            keep = ~done
            widx = widx[keep]
            ax_w, ay_w, rssi_w, ref_w, nexp_w = (
                ax_w[keep], ay_w[keep], rssi_w[keep], ref_w[keep], nexp_w[keep],
            )
            sig2_w, two_sig2_w, qv_w, kgrad_w = (
                sig2_w[keep], two_sig2_w[keep], qv_w[keep], kgrad_w[keep],
            )
            ppx_w, ppy_w, ipv_w = ppx_w[keep], ppy_w[keep], ipv_w[keep]
            d_cur, err_cur = d_cur[keep], err_cur[keep]
            cur_x, cur_y = cur_x[keep], cur_y[keep]
            best_x, best_y, best_ll = best_x[keep], best_y[keep], best_ll[keep]
            lr = lr[keep]
            frozen = frozen[keep]
    if len(widx):
        best_x_full[widx] = best_x
        best_y_full[widx] = best_y
    best_x, best_y = best_x_full, best_y_full

    out = []
    for r, g in enumerate(groups):
        k = len(g["rssi"])
        d = np.maximum(np.hypot(ax[r, :k] - best_x[r], ay[r, :k] - best_y[r]), 1.0)
        err = rssi[r, :k] - (ref[r, :k] - 10.0 * n_exp[r, :k] * np.log10(d))
        resid = float(np.sqrt(np.mean(err**2)))
        n = k
        connected_mean = float(np.mean(g["connected"]))
        alts = g["alt"][~np.isnan(g["alt"])]
        # posterior accuracy: 1/P_post = 1/P_prior + 1/R_batch (doc :195-206);
        # prior-less groups have ipv=0, reducing to the plain MLE accuracy
        r_std = max(3.0, resid * 2.0)
        post_var = 1.0 / (ipv[r] + 1.0 / (r_std * r_std))
        conf = min(0.95, 0.5 + 0.002 * n + (0.2 if connected_mean > 0.3 else 0.0))
        if ipv[r] > 0.0:
            conf = min(0.97, conf + 0.05)  # tighter posterior (doc :159)
        out.append(
            [
                "BAYESIAN" if ipv[r] > 0.0 else "MLE",
                lat0[r] + float(best_y[r]) / METERS_PER_DEG,
                lon0[r] + float(best_x[r]) / (METERS_PER_DEG * coslat[r]),
                float(alts.mean()) if len(alts) else None,
                max(3.0, math.sqrt(post_var)),
                conf,
                n,
            ]
        )
    return out


_MLE_PACK_COLS = (
    "latitude", "longitude", "altitude", "rssi",
    "quality_weight", "connection_status", "frequency",
)


def _run_mle_packed(batches):
    for pdf in batches:
        bssids, groups = [], []
        has_prior = "prior_lat" in pdf.columns
        for i, (bssid, obs) in enumerate(zip(pdf["bssid"], pdf["obs"])):
            to = lambda key: np.array([o[key] for o in obs], dtype=float)  # noqa: E731
            bssids.append(bssid)
            g = {
                "lat": to("latitude"),
                "lon": to("longitude"),
                "alt": to("altitude"),
                "rssi": to("rssi"),
                "qw": to("quality_weight"),
                "connected": np.array(
                    [o["connection_status"] == "CONNECTED" for o in obs]
                ),
                "freq": to("frequency"),
            }
            if has_prior and pd.notna(pdf["prior_lat"].iloc[i]):
                g["prior"] = (
                    float(pdf["prior_lat"].iloc[i]),
                    float(pdf["prior_lon"].iloc[i]),
                    float(pdf["prior_var"].iloc[i]),
                )
            groups.append(g)
        rows = (
            [[b, *r] for b, r in zip(bssids, _mle_localize_batch(groups))]
            if groups
            else []
        )
        yield pd.DataFrame(rows, columns=[f.name for f in AP_LOCATION_SCHEMA.fields])


def _capped(measurements: DataFrame, max_rows_per_ap: int) -> DataFrame:
    """Per-AP skew cap keeping strongest-RSSI rows (most informative),
    mirroring the reference's ORDER BY … LIMIT lookback."""
    w = Window.partitionBy("bssid").orderBy(F.col("rssi").desc(), F.col("event_id"))
    return (
        measurements.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_rows_per_ap)
        .drop("_rn")
    )


def _pack_obs(measurements: DataFrame, max_rows_per_ap: int = 2000) -> DataFrame:
    """(bssid, obs array) — the lockstep kernel's packed input."""
    return (
        _capped(measurements, max_rows_per_ap)
        .groupBy("bssid")
        .agg(F.collect_list(F.struct(*_MLE_PACK_COLS)).alias("obs"))
    )


def _prior_cols(prior_state: DataFrame) -> DataFrame:
    """(bssid, prior_lat/lon/var) — the kernel's prior-column convention."""
    return prior_state.select(
        "bssid",
        F.col("latitude").alias("prior_lat"),
        F.col("longitude").alias("prior_lon"),
        F.col("p_var_m2").alias("prior_var"),
    )


def _dispatch_numeric(packed: DataFrame) -> DataFrame:
    """Repartition to kernel width and run the lockstep gradient ascent."""
    spark = packed.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism // 2)
    return packed.repartition(n_parts).mapInPandas(_run_mle_packed, AP_LOCATION_SCHEMA)


def mle_localize(measurements: DataFrame, max_rows_per_ap: int = 2000) -> DataFrame:
    """Tier-2/3 MLE: pack each AP's capped rows into one array row, then run
    the lockstep-batched gradient ascent in mapInPandas (one Python call per
    Arrow batch of APs instead of one per AP)."""
    return _dispatch_numeric(_pack_obs(measurements, max_rows_per_ap))


def mle_localize_grouped(measurements: DataFrame, max_rows_per_ap: int = 2000) -> DataFrame:
    """Reference shape: one applyInPandas call per AP (parity baseline for
    the packed-batch path)."""
    cols = ["bssid", *_MLE_PACK_COLS]
    return _capped(measurements, max_rows_per_ap).select(*cols).groupBy("bssid").applyInPandas(
        _mle_localize_group, AP_LOCATION_SCHEMA
    )


def bayesian_localize(
    measurements: DataFrame, prior_state: DataFrame, max_rows_per_ap: int = 2000
) -> DataFrame:
    """Tier-3 Bayesian inference (doc :163-169): MAP gradient ascent fusing
    the per-AP prior state (x̂, P) with the batch log-likelihood — the same
    lockstep-batched kernel as the MLE tier with the Gaussian log-prior term
    switched on. APs with no prior row degrade gracefully to plain MLE
    (label stays honest: 'MLE').

    prior_state: (bssid, latitude, longitude, p_var_m2) — the kalman_update
    state convention."""
    packed = _pack_obs(measurements, max_rows_per_ap).join(
        F.broadcast(_prior_cols(prior_state)), "bssid", "left"
    )
    return _dispatch_numeric(packed)


def wcl_prior_state(history: DataFrame) -> DataFrame:
    """Prior state (x̂, P) from historical measurements: the WCL estimate with
    a spread-derived scalar variance — the bootstrap form of the persisted
    Kalman state when no previous batch exists (doc :184-191)."""
    est = wcl_localize(history)
    return est.select(
        "bssid",
        "latitude",
        "longitude",
        F.pow(F.col("horizontal_accuracy"), 2).alias("p_var_m2"),
    )


def localize_all(
    measurements: DataFrame,
    cfg: C.EngineConfig = C.DEFAULT_CONFIG,
    prior_state: DataFrame | None = None,
) -> DataFrame:
    """Route every sufficient BSSID to its maturity tier and localize.

    With ``prior_state`` (the persisted AP state), tier-3 BAYESIAN APs run
    MAP estimation against their prior (doc :163-169). Without it they run
    the prior-less MLE estimator and the posterior fusion is deferred to
    ``kalman_update`` against the existing AP state (doc :184-213).
    """
    clean = measurements.filter(~F.coalesce(F.col("is_global_outlier"), F.lit(False)))
    routing = tier_routing(measurements, cfg)
    wcl_ids = routing.filter(F.col("tier") == "WCL").select("bssid")
    wcl_out = wcl_localize(clean.join(wcl_ids, "bssid", "left_semi"))
    if prior_state is None:
        mle_ids = routing.filter(F.col("tier").isin("MLE", "BAYESIAN")).select("bssid")
        return wcl_out.unionByName(mle_localize(clean.join(mle_ids, "bssid", "left_semi")))
    mle_ids = routing.filter(F.col("tier") == "MLE").select("bssid")
    bayes_ids = routing.filter(F.col("tier") == "BAYESIAN").select("bssid")
    mle_out = mle_localize(clean.join(mle_ids, "bssid", "left_semi"))
    bayes_out = bayesian_localize(clean.join(bayes_ids, "bssid", "left_semi"), prior_state)
    return wcl_out.unionByName(mle_out).unionByName(bayes_out)


def localize_with_history(
    measurements: DataFrame, cfg: C.EngineConfig = C.DEFAULT_CONFIG
) -> DataFrame:
    """The doc :196-206 feedback loop in one batch job: tier-3 APs take their
    prior from the chronologically older half of their rows (the 'persisted
    state' analog) and fuse it with the newer half's likelihood; WCL/MLE
    tiers are unchanged. Tier routing stays on TOTAL N — maturity counts all
    data ever collected, not the slice used for the likelihood.

    Requires ``measurement_timestamp`` and ``id`` columns (the
    wifi_measurements layout) for the deterministic history split.
    """
    clean = measurements.filter(~F.coalesce(F.col("is_global_outlier"), F.lit(False)))
    # ONE broadcast tier-attach instead of three per-tier semi-joins: the
    # inner join drops below-bootstrap bssids exactly like the semi joins
    # did (routing excludes them), the identical broadcast subtree is
    # reused across the three branches (ReuseExchange), and callers that
    # pre-partition `measurements` by bssid (the bench entry does) get
    # every window/groupBy below exchange-free on top of it
    routing = tier_routing(measurements, cfg)
    tiered = clean.join(
        F.broadcast(routing.select("bssid", "tier")), "bssid", "inner"
    )
    wcl_out = wcl_localize(tiered.filter(F.col("tier") == "WCL").drop("tier"))

    bayes = tiered.filter(F.col("tier") == "BAYESIAN").drop("tier")
    w = Window.partitionBy("bssid").orderBy("measurement_timestamp", "id")
    cnt = Window.partitionBy("bssid")
    split = bayes.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(cnt)
    )
    hist = split.filter(F.col("_rn") <= F.col("_n") / 2).drop("_rn", "_n")
    new = split.filter(F.col("_rn") > F.col("_n") / 2).drop("_rn", "_n")

    # MLE and BAYESIAN share _run_mle_packed (a missing prior degrades to
    # plain MLE per row); packing both tiers into ONE relation runs the
    # numeric tier in ONE mapInPandas pass instead of two — the round-6
    # form paid a second full Python-pass floor for the Bayesian branch
    prior = _prior_cols(wcl_prior_state(hist))
    mle_packed = _pack_obs(tiered.filter(F.col("tier") == "MLE").drop("tier")).select(
        "bssid",
        "obs",
        F.lit(None).cast("double").alias("prior_lat"),
        F.lit(None).cast("double").alias("prior_lon"),
        F.lit(None).cast("double").alias("prior_var"),
    )
    bayes_packed = _pack_obs(new).join(F.broadcast(prior), "bssid", "left")
    packed = mle_packed.unionByName(bayes_packed.select(*mle_packed.columns))
    return wcl_out.unionByName(_dispatch_numeric(packed))


def kalman_update(prior_state: DataFrame, new_estimates: DataFrame) -> DataFrame:
    """Scalar-diagonal Kalman fusion of AP state with a new batch estimate
    (doc :184-213): x̂ₖ = x̂ₖ₋₁ + K(zₖ − x̂ₖ₋₁), K = P/(P+R), Pₖ = (1−K)P.

    State is carried as a per-axis variance (meters²) derived from accuracy;
    a large innovation vs. the predicted position flags relocation (doc
    :207-213) → state reset to the new estimate with inflated covariance.

    prior_state:  (bssid, latitude, longitude, p_var_m2)
    new_estimates: (bssid, latitude, longitude, horizontal_accuracy, …)
    Returns the fused state (bssid, latitude, longitude, p_var_m2, relocated).
    """
    z = new_estimates.select(
        "bssid",
        F.col("latitude").alias("z_lat"),
        F.col("longitude").alias("z_lon"),
        F.pow(F.col("horizontal_accuracy"), 2).alias("r_var"),
    )
    joined = prior_state.join(z, "bssid", "full")

    innovation_m = F.sqrt(
        F.pow((F.col("z_lat") - F.col("latitude")) * METERS_PER_DEG, 2)
        + F.pow((F.col("z_lon") - F.col("longitude")) * METERS_PER_DEG * 0.766, 2)
    )
    relocated = innovation_m > 3.0 * F.sqrt(F.col("p_var_m2") + F.col("r_var"))
    gain = F.col("p_var_m2") / (F.col("p_var_m2") + F.col("r_var"))

    fused_lat = F.col("latitude") + gain * (F.col("z_lat") - F.col("latitude"))
    fused_lon = F.col("longitude") + gain * (F.col("z_lon") - F.col("longitude"))
    fused_var = (1.0 - gain) * F.col("p_var_m2")

    return joined.select(
        "bssid",
        F.when(F.col("latitude").isNull(), F.col("z_lat"))       # new AP
        .when(F.col("z_lat").isNull(), F.col("latitude"))        # no new data
        .when(relocated, F.col("z_lat"))                          # reset on move
        .otherwise(fused_lat)
        .alias("latitude"),
        F.when(F.col("longitude").isNull(), F.col("z_lon"))
        .when(F.col("z_lon").isNull(), F.col("longitude"))
        .when(relocated, F.col("z_lon"))
        .otherwise(fused_lon)
        .alias("longitude"),
        F.when(F.col("p_var_m2").isNull(), F.col("r_var"))
        .when(F.col("r_var").isNull(), F.col("p_var_m2"))
        .when(relocated, F.col("r_var") * 4.0)                    # inflated restart
        .otherwise(fused_var)
        .alias("p_var_m2"),
        F.coalesce(relocated, F.lit(False)).alias("relocated"),
    )
