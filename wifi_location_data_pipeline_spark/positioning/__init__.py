"""The positioning ensemble (SURVEY.md §2.7) re-expressed as DataFrame ops.

The reference runs six algorithms per HTTP request on a thread pool; here a
*DataFrame of requests* flows through one declarative plan:

    requests → explode observations → broadcast-join known APs → physics gate
    → per-request context classification (SQL aggregates, incl. GDOP +
    collinearity in closed form) → selection weight matrix (CASE exprs)
    → eligible algorithms (closed-form SQL for proximity / WCL / log-distance /
    RSSI-ratio; applyInPandas for trilateration / MLE) → robust weighted
    combine → one position row per request.

Millions of requests batch-position in a single job; at 100 TB the only
shuffle is the per-request groupBy, and the AP dimension joins broadcast.
"""
