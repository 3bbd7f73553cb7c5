"""Data-quality check engine — single-pass, expression-compiled.

Re-expresses the reference's ``DataQualityCheckOperator`` check language
(ref: operators/data_quality_operator.py:77-117):

- ``min_row_count`` (threshold) — ref :81-88
- ``required_columns`` (presence) — ref :91-100
- ``unique_column`` — ref :103-114 (fails when the column is absent, :112-114)
- unknown check types are reported, not crashed on — ref :116-117

Differences by design:

1. **One scan, not N.** The reference runs each check as a separate pandas
   pass over the whole file. Here every data-touching check compiles to an
   aggregate EXPRESSION and all of them evaluate in ONE ``df.agg(...)`` job
   — at 100 TB that is the difference between 1 and N full-table scans.
   Metadata checks (required_columns) never touch data at all.
2. **Reports, not exceptions.** The reference raises on failure, which makes
   its own FAILED branch unreachable (xcom_push at ref :129 only runs on
   success while dag_factory.py:38 branches on the pushed status — a
   reference bug we do not reproduce). ``run_checks`` returns a ``DQReport``;
   the caller (pipeline runner) decides to publish, quarantine, or alert.
3. **Exact/approx tiers.** ``unique_column`` supports
   ``approx=True`` → ``approx_count_distinct`` for a cheap 100 TB pre-gate.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNOWN_CHECKS = (
    "min_row_count",
    "required_columns",
    "unique_column",
    # engine extensions beyond reference parity — same fused-agg contract
    "non_null",
    "value_range",
    "accepted_values",
    "foreign_key",
    "freshness",
    "quantile_range",
)


@dataclass(frozen=True)
class Check:
    """One declarative check (same dict shape as the reference YAML,
    ref: configs/sources/marketing_api_campaigns.yaml:28-34)."""

    check_type: str
    params: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Check":
        d = dict(d)
        return cls(check_type=d.pop("check_type"), params=d)

    @property
    def name(self) -> str:
        target = (
            self.params.get("column")
            or ",".join(self.params.get("columns", []) or [])
            or self.params.get("threshold", "")
        )
        return f"{self.check_type}({target})"


@dataclass
class CheckResult:
    check: Check
    passed: bool
    detail: str = ""


@dataclass
class DQReport:
    results: list[CheckResult]
    #: total input rows, populated when run_checks(count_rows=True) —
    #: free observability: the count rides the same fused single-pass agg.
    n_rows: int | None = None

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    @property
    def failures(self) -> list[str]:
        return [f"{r.check.name}: {r.detail}" for r in self.results if not r.passed]

    def to_df(self, spark) -> DataFrame:
        rows = [
            (r.check.check_type, r.check.name, r.passed, r.detail)
            for r in self.results
        ]
        return spark.createDataFrame(
            rows, "check_type string, check_name string, passed boolean, detail string"
        )


def compile_checks(
    df: DataFrame, checks: list[Check]
) -> tuple[list[Column], list[tuple[Check, Any]]]:
    """Compile checks against a DataFrame.

    Returns (aggregate_columns, immediate_results). Data-touching checks
    yield one aggregate expression each (fused later into a single
    ``df.agg``); metadata-only checks and malformed checks resolve
    immediately without running a job.
    """
    agg_cols: list[Column] = []
    immediate: list[tuple[Check, Any]] = []
    for i, check in enumerate(checks):
        t, p = check.check_type, check.params
        if t == "min_row_count":
            # COUNT once; compared to threshold after the single pass.
            agg_cols.append(F.count(F.lit(1)).alias(f"_dq_{i}_rows"))
        elif t == "required_columns":
            missing = [c for c in p.get("columns", []) if c not in df.columns]
            immediate.append((check, {"missing": missing}))
        elif t == "unique_column":
            col = p.get("column")
            if col not in df.columns:
                # Reference fails this case too (ref :112-114).
                immediate.append((check, {"absent": True}))
            elif p.get("approx"):
                agg_cols.append(
                    F.approx_count_distinct(col).alias(f"_dq_{i}_distinct")
                )
                agg_cols.append(F.count(col).alias(f"_dq_{i}_count"))
            else:
                agg_cols.append(F.count_distinct(F.col(col)).alias(f"_dq_{i}_distinct"))
                agg_cols.append(F.count(col).alias(f"_dq_{i}_count"))
        elif t in ("non_null", "value_range", "accepted_values"):
            col = p.get("column")
            if col not in df.columns:
                immediate.append((check, {"absent": True}))
            elif t == "non_null":
                agg_cols.append(
                    F.sum(F.col(col).isNull().cast("long")).alias(f"_dq_{i}_nulls")
                )
                agg_cols.append(F.count(F.lit(1)).alias(f"_dq_{i}_rows"))
            elif t == "value_range":
                lo, hi = p.get("min"), p.get("max")
                viol = F.lit(False)
                if lo is not None:
                    viol = viol | (F.col(col) < F.lit(lo))
                if hi is not None:
                    viol = viol | (F.col(col) > F.lit(hi))
                agg_cols.append(F.sum(viol.cast("long")).alias(f"_dq_{i}_viol"))
            else:  # accepted_values
                ok = F.col(col).isin(list(p.get("values", []))) | F.col(col).isNull()
                agg_cols.append(F.sum((~ok).cast("long")).alias(f"_dq_{i}_viol"))
        elif t == "freshness":
            # max(ts) fuses into the single pass; the lag comparison happens
            # driver-side against the run's explicit as_of (never wall-clock
            # now() — freshness must be reproducible per scheduled run).
            col = p.get("column")
            if col not in df.columns:
                immediate.append((check, {"absent": True}))
            else:
                agg_cols.append(
                    F.max(F.col(col).cast("timestamp")).alias(f"_dq_{i}_maxts")
                )
        elif t == "quantile_range":
            # statistical gate: an approximate quantile of the column must
            # sit inside [min, max] — catches silent unit changes (cents
            # vs dollars) and distribution collapse that value_range's
            # hard bounds cannot see. approx_percentile fuses into the
            # same single-pass agg (t-digest partials combine map-side).
            col = p.get("column")
            if col not in df.columns:
                immediate.append((check, {"absent": True}))
            else:
                q = float(p.get("q", 0.5))
                agg_cols.append(
                    F.percentile_approx(
                        F.col(col).cast("double"), q, 10000
                    ).alias(f"_dq_{i}_quant")
                )
        elif t == "foreign_key":
            # Referential integrity needs a second table — it cannot fuse
            # into the single-pass agg; compile_checks defers it and
            # run_checks executes one anti-join job per such check.
            col = p.get("column")
            if col not in df.columns:
                immediate.append((check, {"absent": True}))
        else:
            # Unknown check type: recorded, not fatal (ref :116-117 warns+skips;
            # we surface it in the report instead of silently passing).
            immediate.append((check, {"unknown": True}))
    return agg_cols, immediate


def run_checks(
    df: DataFrame, checks: list[Check | dict], count_rows: bool = False
) -> DQReport:
    """Evaluate all checks in at most ONE Spark job."""
    checks = [c if isinstance(c, Check) else Check.from_dict(c) for c in checks]
    agg_cols, immediate = compile_checks(df, checks)
    if count_rows:
        agg_cols = list(agg_cols) + [
            F.count(F.lit(1)).alias("_dq_total_rows")
        ]
    row = df.agg(*agg_cols).collect()[0].asDict() if agg_cols else {}

    results: list[CheckResult] = []
    imm = {id(c): v for c, v in immediate}
    for i, check in enumerate(checks):
        t, p = check.check_type, check.params
        if id(check) in imm:
            v = imm[id(check)]
            if t == "required_columns":
                missing = v["missing"]
                results.append(
                    CheckResult(check, not missing, f"missing columns: {missing}" if missing else "all present")
                )
            elif t in ("unique_column", "non_null", "value_range", "accepted_values", "foreign_key", "freshness", "quantile_range"):
                results.append(CheckResult(check, False, f"column '{p.get('column')}' not found"))
            else:
                results.append(CheckResult(check, False, f"unknown check_type '{t}'"))
        elif t == "min_row_count":
            n = row[f"_dq_{i}_rows"]
            thr = int(p.get("threshold", 0))
            results.append(CheckResult(check, n >= thr, f"rows={n} threshold={thr}"))
        elif t == "unique_column":
            d, c = row[f"_dq_{i}_distinct"], row[f"_dq_{i}_count"]
            results.append(CheckResult(check, d == c, f"distinct={d} non-null={c}"))
        elif t == "non_null":
            nulls, n = row[f"_dq_{i}_nulls"] or 0, row[f"_dq_{i}_rows"]
            frac = (nulls / n) if n else 0.0
            max_frac = float(p.get("max_null_fraction", 0.0))
            results.append(
                CheckResult(check, frac <= max_frac, f"null_fraction={frac:.6f} max={max_frac}")
            )
        elif t in ("value_range", "accepted_values"):
            viol = row[f"_dq_{i}_viol"] or 0
            results.append(CheckResult(check, viol == 0, f"violations={viol}"))
        elif t == "quantile_range":
            qv = row[f"_dq_{i}_quant"]
            lo, hi = p.get("min"), p.get("max")
            ok = qv is not None
            if ok and lo is not None:
                ok = qv >= float(lo)
            if ok and hi is not None:
                ok = qv <= float(hi)
            results.append(
                CheckResult(
                    check,
                    bool(ok),
                    f"q{p.get('q', 0.5)}={qv} bounds=[{lo}, {hi}]",
                )
            )
        elif t == "freshness":
            import datetime as _dt

            maxts = row[f"_dq_{i}_maxts"]
            as_of = p.get("as_of")
            as_of_dt = (
                _dt.datetime.fromisoformat(as_of)
                if isinstance(as_of, str)
                else as_of
            )
            lag = float(p.get("max_lag_seconds", 86400))
            if maxts is None or as_of_dt is None:
                results.append(
                    CheckResult(check, False, f"max({p.get('column')})=None")
                )
            else:
                behind = (as_of_dt - maxts).total_seconds()
                results.append(
                    CheckResult(
                        check,
                        behind <= lag,
                        f"max_ts={maxts.isoformat()} lag_s={behind:.0f} max_lag_s={lag:.0f}",
                    )
                )
        elif t == "foreign_key":
            # side job: orphan keys = left anti join against the ref column.
            # At 100 TB the ref side is usually a dimension → broadcast; a
            # fact-fact FK check becomes one shuffled semi/anti join, which
            # is the minimum possible cost for exact referential integrity.
            col, ref_col = p["column"], p["ref_column"]
            spark = df.sparkSession
            ref = spark.read.parquet(p["ref_path"]).select(
                F.col(ref_col).alias("__ref_key")
            )
            if p.get("broadcast", True):
                ref = F.broadcast(ref)
            orphans = (
                df.select(F.col(col).alias("__key"))
                .filter(F.col("__key").isNotNull())
                .join(ref, F.col("__key") == F.col("__ref_key"), "left_anti")
                .count()
            )
            results.append(
                CheckResult(check, orphans == 0, f"orphan_keys={orphans}")
            )
    return DQReport(results, n_rows=row.get("_dq_total_rows"))


def profile(df, cols: list[str] | None = None):
    """Single-pass column profiler — the self-service ``ANALYZE TABLE``.

    One aggregation job computes, per column: row count, non-null count,
    exact distinct count, and (for numeric/timestamp columns) min/max as
    doubles. Long-format output: (col_name, n_rows, n_nonnull, n_distinct,
    min_num, max_num).

    Scale: ONE scan; the multiple COUNT(DISTINCT)s expand the input
    |cols|-way before the shuffle (Spark's Expand), so for very wide tables
    at 100 TB profile in column batches or swap in approx_count_distinct
    (the DQ engine's ``approx=True`` tier) — exact is the default because
    profiles feed uniqueness decisions.
    """
    from pyspark.sql import functions as F

    cols = cols or df.columns
    numeric_kinds = ("int", "long", "short", "byte", "float", "double", "decimal")
    dtypes = dict(df.dtypes)
    aggs, structs = [], []
    for c in cols:
        is_num = any(k in dtypes[c] for k in numeric_kinds)
        is_ts = "timestamp" in dtypes[c] or dtypes[c] == "date"
        if is_num:
            val = F.col(c).cast("double")
        elif is_ts:
            # epoch seconds as double (mirrors DuckDB epoch_us(x)/1e6)
            val = F.unix_micros(F.col(c).cast("timestamp")).cast("double") / F.lit(
                1000000.0
            )
        else:
            val = F.lit(None).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"_{c}_rows"),
            F.count(c).alias(f"_{c}_nonnull"),
            F.countDistinct(c).alias(f"_{c}_distinct"),
            F.min(val).alias(f"_{c}_min"),
            F.max(val).alias(f"_{c}_max"),
        ]
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"_{c}_rows").alias("n_rows"),
                F.col(f"_{c}_nonnull").alias("n_nonnull"),
                F.col(f"_{c}_distinct").alias("n_distinct"),
                F.col(f"_{c}_min").alias("min_num"),
                F.col(f"_{c}_max").alias("max_num"),
            )
        )
    wide = df.agg(*aggs)
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


#: checks with a per-row meaning (a row either satisfies them or not);
#: table-level checks (min_row_count, unique_column, ...) have no row form.
ROW_CHECKS = ("non_null", "value_range", "accepted_values")


def row_violation_expr(check: "Check | dict"):
    """Boolean Column: does a ROW violate this check? (NULL-safe: an
    absent comparison evaluates to a violation only where defined so —
    SQL three-valued logic is collapsed explicitly.)"""
    c = check if isinstance(check, Check) else Check.from_dict(check)
    t, p = c.check_type, c.params
    if t not in ROW_CHECKS:
        raise ValueError(
            f"'{t}' has no per-row form (row checks: {ROW_CHECKS})"
        )
    col = F.col(p["column"])
    if t == "non_null":
        return col.isNull()
    if t == "value_range":
        lo, hi = p.get("min"), p.get("max")
        v = F.lit(False)
        if lo is not None:
            v = v | (col < F.lit(lo))
        if hi is not None:
            v = v | (col > F.lit(hi))
        return F.coalesce(v, F.lit(False))  # NULLs are non_null's job
    if t == "accepted_values":
        return F.coalesce(
            ~col.isin(*p["values"]), F.lit(False)
        )
    raise ValueError(f"'{t}' has no per-row form (row checks: {ROW_CHECKS})")


def split_by_checks(
    df: DataFrame, checks: list["Check | dict"]
) -> tuple[DataFrame, DataFrame]:
    """Row-level quarantine: (good_rows, bad_rows_with_violations).

    The batch gate (run_checks + the pipeline branch) quarantines a
    whole landing when ANY check fails; this is the complementary
    self-service mode — keep the clean rows, divert only offenders, each
    tagged with a ``_violations`` array naming the checks it broke.

    One pass, pure expressions: every check compiles to a violation
    Column, the array is built per row inside codegen, and the two
    outputs are filters over the same plan (Spark shares the scan).
    """
    named = []
    for c in checks:
        cc = c if isinstance(c, Check) else Check.from_dict(c)
        named.append(
            F.when(row_violation_expr(cc), F.lit(cc.name)).otherwise(
                F.lit(None)
            )
        )
    tagged = df.withColumn(
        "_violations",
        F.array_compact(F.array(*named)) if named else F.array().cast(
            "array<string>"
        ),
    )
    good = tagged.filter(F.size("_violations") == 0).drop("_violations")
    bad = tagged.filter(F.size("_violations") > 0)
    return good, bad
