"""Shadow-comparison of two positioning answers per request (SURVEY §7 step 8).

Re-expresses wifi-positioning-integration-service's ComparisonService
(src/main/java/com/wifi/positioning/service/ComparisonService.java:29,
289-296,424-437): haversine distance between the two answers, expected
combined uncertainty √(a²+b²), and the agreement classification. The module
doubles as a self-validation harness — compare the engine's positions against
any oracle position source (e.g. planted truth or a second algorithm tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark.functions.geo import haversine_m


def compare_positions(
    primary: DataFrame,
    shadow: DataFrame,
    key: str = "request_id",
) -> DataFrame:
    """Join two (key, latitude, longitude, accuracy) answer sets and score
    agreement per request.

    agreement: AGREE if distance <= sqrt(acc_a^2 + acc_b^2) (both services'
    claimed uncertainties jointly explain the disagreement), else DISAGREE;
    requests answered by only one side classify as PRIMARY_ONLY/SHADOW_ONLY
    (ComparisonService's missing-result branches).
    """
    a = primary.select(
        key,
        F.col("latitude").alias("lat_a"),
        F.col("longitude").alias("lon_a"),
        F.col("accuracy").alias("acc_a"),
    )
    b = shadow.select(
        key,
        F.col("latitude").alias("lat_b"),
        F.col("longitude").alias("lon_b"),
        F.col("accuracy").alias("acc_b"),
    )
    j = a.join(b, key, "full")
    dist = haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    expected = F.sqrt(F.col("acc_a") * F.col("acc_a") + F.col("acc_b") * F.col("acc_b"))
    return j.select(
        key,
        dist.alias("disagreement_m"),
        expected.alias("expected_uncertainty_m"),
        F.when(F.col("lat_a").isNull(), "SHADOW_ONLY")
        .when(F.col("lat_b").isNull(), "PRIMARY_ONLY")
        .when(dist <= expected, "AGREE")
        .otherwise("DISAGREE")
        .alias("agreement"),
    )


def _is_insufficient_ap_error(msg: Column) -> Column:
    """ComparisonScenario.isInsufficientApError (ComparisonScenario.java:152-168):
    case-insensitive containment of the known insufficient-AP phrases; a NULL
    message is not an insufficient-AP error."""
    low = F.lower(msg)
    return msg.isNotNull() & (
        low.contains("no known access points found in database")
        | low.contains("no access points with valid status found")
        | (low.contains("insufficient") & low.contains("access point"))
    )


def comparison_scenario(
    vlss_success: Column,
    frisco_success: Column,
    frisco_error_message: Column,
    vlss_accuracy: Column,
) -> Column:
    """ComparisonScenario.determineScenario (ComparisonScenario.java:99-133).

    The integration service's per-request success/failure decision tree,
    including VLSS_CELL_FALLBACK_DETECTED (insufficient-AP Frisco error +
    vlssAccuracy >= 250 m ⇒ VLSS answered from cell towers). NULL
    vlss_success means "no VLSS response provided"; NULL frisco_success is
    treated as failure (Boolean.TRUE.equals in the reference).
    """
    cell = vlss_accuracy.isNotNull() & (vlss_accuracy >= 250.0)
    return (
        F.when(vlss_success.isNull(), "FRISCO_ONLY_ANALYSIS")
        .when(
            vlss_success,
            F.when(frisco_success, "BOTH_WIFI_SUCCESS")
            .when(
                _is_insufficient_ap_error(frisco_error_message) & cell,
                "VLSS_CELL_FALLBACK_DETECTED",
            )
            .when(cell, "VLSS_SUCCESS_FRISCO_ERROR_CELL")
            .otherwise("VLSS_SUCCESS_FRISCO_ERROR_WIFI"),
        )
        .when(frisco_success, "VLSS_ERROR_FRISCO_SUCCESS")
        .otherwise("BOTH_INSUFFICIENT_DATA")
    )


# scenario → LocationType (the enum's third constructor arg,
# ComparisonScenario.java:16-64; UNKNOWN_SCENARIO is declared but unreachable
# from determineScenario, kept for map completeness)
_SCENARIO_LOCATION_TYPE = {
    "BOTH_WIFI_SUCCESS": "WIFI",
    "VLSS_CELL_FALLBACK_DETECTED": "CELL",
    "BOTH_INSUFFICIENT_DATA": "NONE",
    "VLSS_ERROR_FRISCO_SUCCESS": "WIFI",
    "FRISCO_ONLY_ANALYSIS": "WIFI",
    "VLSS_SUCCESS_FRISCO_ERROR_WIFI": "WIFI",
    "VLSS_SUCCESS_FRISCO_ERROR_CELL": "CELL",
    "UNKNOWN_SCENARIO": "UNKNOWN",
}


def scenario_location_type(scenario: Column) -> Column:
    """LocationType carried by each scenario (ComparisonService.java:64
    setLocationType(scenario.getLocationType()))."""
    expr = F.lit(None).cast("string")
    for code, loc in _SCENARIO_LOCATION_TYPE.items():
        expr = F.when(scenario == code, loc).otherwise(expr)
    return expr


def classify_comparison(report: DataFrame) -> DataFrame:
    """Full per-request scenario classification + agreement analysis.

    Mirrors ComparisonService.compareResults → determineScenario →
    performComparisonAnalysis → performConfidenceAnalysis
    (ComparisonService.java:39-64,250-349). Input columns: request_id,
    vlss_success (nullable bool), frisco_success (bool),
    frisco_error_message, vlss_accuracy, vlss_lat, vlss_lon, frisco_lat,
    frisco_lon, frisco_accuracy. Adds:

    - scenario, location_type — the 9-way decision tree
    - haversine_distance_m / expected_uncertainty_m — only where the
      reference computes them: performComparisonAnalysis is gated on
      vlssSuccess being TRUE (ComparisonService.java:246), which for the
      non-special scenarios means exactly BOTH_WIFI_SUCCESS; a failed VLSS
      response that still carries locationInfo coordinates gets NULL metrics
    - agreement_analysis — the verbatim analysis strings ("NO WIFI
      COVERAGE", "FRISCO FAILURE", "PERFECT AGREEMENT", "WIFI VS CELL
      DISAGREEMENT", "GOOD AGREEMENT", "FRISCO WITHIN BOUNDS" /
      "... MODERATELY OVERCONFIDENT" / "... OVERCONFIDENT" /
      "... EXTREMELY OVERCONFIDENT")
    - confidence_ratio — distance / frisco accuracy (0.0 on perfect
      agreement; unset on the WIFI-vs-CELL early return, as the reference)

    Pure CASE-expression column math — one projection, no shuffle, scales
    to any request volume.
    """
    scenario = comparison_scenario(
        F.col("vlss_success"),
        F.col("frisco_success"),
        F.col("frisco_error_message"),
        F.col("vlss_accuracy"),
    )
    df = report.withColumn("scenario", scenario).withColumn(
        "location_type", scenario_location_type(F.col("scenario"))
    )
    # performComparisonAnalysis runs only when vlssSuccess is TRUE
    # (ComparisonService.java:246); the special scenarios short-circuit to
    # verbatim strings, so the numeric path is exactly BOTH_WIFI_SUCCESS.
    analyzed = F.col("scenario") == "BOTH_WIFI_SUCCESS"
    have_pos = (
        F.col("vlss_lat").isNotNull()
        & F.col("vlss_lon").isNotNull()
        & F.col("frisco_lat").isNotNull()
        & F.col("frisco_lon").isNotNull()
    )
    dist = haversine_m(
        F.col("vlss_lat"), F.col("vlss_lon"), F.col("frisco_lat"), F.col("frisco_lon")
    )
    have_acc = F.col("vlss_accuracy").isNotNull() & F.col("frisco_accuracy").isNotNull()
    expected = F.sqrt(
        F.col("vlss_accuracy") * F.col("vlss_accuracy")
        + F.col("frisco_accuracy") * F.col("frisco_accuracy")
    )
    ratio = dist / F.col("frisco_accuracy")
    fa_pos = F.col("frisco_accuracy") > 0.0
    # performConfidenceAnalysis (ComparisonService.java:306-349), evaluated
    # only when both positions AND both accuracies are present
    confidence = (
        F.when(dist == 0.0, "PERFECT AGREEMENT")
        .when(F.col("vlss_accuracy") >= 250.0, "WIFI VS CELL DISAGREEMENT")
        .when(dist < expected, "GOOD AGREEMENT")
        .when(fa_pos & (ratio <= 1.0), "FRISCO WITHIN BOUNDS")
        .when(fa_pos & (ratio <= 1.5), "FRISCO MODERATELY OVERCONFIDENT")
        .when(fa_pos & (ratio <= 2.5), "FRISCO OVERCONFIDENT")
        .when(fa_pos, "FRISCO EXTREMELY OVERCONFIDENT")
    )
    analysis = (
        F.when(F.col("scenario") == "VLSS_CELL_FALLBACK_DETECTED", "NO WIFI COVERAGE")
        .when(F.col("scenario") == "VLSS_SUCCESS_FRISCO_ERROR_WIFI", "FRISCO FAILURE")
        .when(F.col("scenario") == "VLSS_SUCCESS_FRISCO_ERROR_CELL", "NO WIFI COVERAGE")
        .when(analyzed & have_pos & have_acc, confidence)
    )
    conf_ratio = F.when(
        analyzed & have_pos & have_acc,
        F.when(dist == 0.0, F.when(fa_pos, F.lit(0.0)))
        .when(F.col("vlss_accuracy") >= 250.0, F.lit(None).cast("double"))
        .when(fa_pos, ratio),
    )
    return (
        df.withColumn(
            "haversine_distance_m", F.when(analyzed & have_pos, dist)
        )
        .withColumn(
            "expected_uncertainty_m", F.when(analyzed & have_pos & have_acc, expected)
        )
        .withColumn("agreement_analysis", analysis)
        .withColumn("confidence_ratio", conf_ratio)
    )


def vlss_error_details(resp: Column) -> Column:
    """ComparisonService.extractVlssErrorDetails (ComparisonService.java:
    399-419): structured ``svcError.errors`` entries render as
    ``Code <code>: <message> (<description>)`` joined with ``"; "``; when
    no structured errors are present, fall back to the legacy top-level
    ``errorMessage`` field. NULL when neither exists. A NULL code/message/
    description inside a structured entry renders as the literal text
    ``null`` — Java's StringBuilder.append(Object) semantics; without the
    coalesce the concat would NULL out and array_join would silently drop
    the whole entry (r9 ADVICE)."""
    errors = resp.getField("svcError").getField("errors")
    nul = lambda c: F.coalesce(c.cast("string"), F.lit("null"))  # noqa: E731
    structured = F.array_join(
        F.transform(
            errors,
            lambda e: F.concat(
                F.lit("Code "),
                nul(e.getField("code")),
                F.lit(": "),
                nul(e.getField("message")),
                F.lit(" ("),
                nul(e.getField("description")),
                F.lit(")"),
            ),
        ),
        "; ",
    )
    return F.when(errors.isNotNull(), structured).otherwise(
        resp.getField("errorMessage")
    )


def parse_vlss_response(df: DataFrame, col: str = "sourceResponse") -> DataFrame:
    """Project a VLSS source-response struct (SourceResponse.java:20-56 —
    success flag, optional locationInfo, optional structured svcError,
    optional legacy errorMessage) to the flat vlss_* columns
    classify_comparison consumes. Pure column expressions over the nested
    struct — schema-driven parse, no UDF, handles every response format in
    the integration service's acceptance fixture corpus."""
    r = F.col(col)
    li = r.getField("locationInfo")
    return df.withColumns(
        {
            "vlss_success": r.getField("success"),
            "vlss_lat": li.getField("latitude").cast("double"),
            "vlss_lon": li.getField("longitude").cast("double"),
            "vlss_accuracy": li.getField("accuracy").cast("double"),
            "vlss_confidence": li.getField("confidence").cast("double"),
            "vlss_error_details": vlss_error_details(r),
        }
    )


def agreement_report(comparison: DataFrame) -> DataFrame:
    """Aggregate agreement metrics (the integration service's summary stats):
    per-class counts, mean/p95 disagreement among compared pairs."""
    return comparison.groupBy("agreement").agg(
        F.count("*").alias("n_requests"),
        F.round(F.avg("disagreement_m"), 2).alias("mean_disagreement_m"),
        F.round(F.percentile_approx("disagreement_m", 0.95, 10000), 2).alias(
            "p95_disagreement_m"
        ),
    )
