"""Deterministic cross-engine fixed-point math.

Oracle parity (Spark vs DuckDB) requires every quantization boundary to
be computed bit-identically in both engines. IEEE-754 guarantees that
+, -, *, / and comparisons are CORRECTLY ROUNDED — given identical
double inputs, the JVM and libc produce identical bits — but libm
transcendentals (ln, exp, pow) only promise ~1 ulp, so an expression
like ``floor(1e6 * ln(p))`` can flip by one between engines whenever
``1e6 * ln(p)`` lands within a few ulps of an integer. That is an
input-dependent landmine: fine on one corpus, a hash mismatch on the
next.

``det_ln_ratio_stages`` removes the landmine by computing
``floor(1e6 * ln(a / b))`` for INTEGER inputs ``1 <= a <= b`` with no
libm call at all:

1. ``d = a/b`` — one correctly-rounded division of exactly-
   representable integers (both < 2^53), identical in both engines.
2. Range-reduce ``d`` to ``mm = d * 2^(e+1) ∈ [1, 2]`` with a 6-step
   binary search whose probes multiply by powers of two — EXACT in
   IEEE-754 (exponent shifts, no mantissa rounding) — so both engines
   take identical branches.
3. ``ln(mm)`` by the atanh series ``2t(1 + u/3 + ... + u^13/27)``,
   ``t = (mm-1)/(mm+1) ∈ [0, 1/3]``, ``u = t²`` — a fixed Horner chain
   of correctly-rounded ops; truncation < 5e-15.
4. ``ln(d) = ln(mm) - (e+1)·ln2`` with ln2 as a double literal.

Every stage is the SAME dialect-neutral SQL text for both engines
(rendered to Spark via ``F.expr`` / withColumn, to DuckDB via lateral
column aliases), so the computation cannot drift between them. The
result defines the operator: it equals the true ``floor(1e6·ln(a/b))``
except when ``1e6·ln(a/b)`` lies within ~5e-7 of an integer, where the
deterministic value may sit one quantum off TRUE — but never off the
OTHER ENGINE, which is the property the oracle hash needs.

Consumers: `queries.textstats.tx_lm_perplexity` (per-bigram
log-probability quantization). Reference analog: none — this is
infrastructure for the rebuild's oracle-parity contract.
"""

from __future__ import annotations

def _dbl(x: float) -> str:
    """A numeric literal forced to DOUBLE in BOTH engines. Spark SQL
    parses a bare decimal literal as DECIMAL and evaluates
    DECIMAL/DECIMAL (and DECIMAL*DECIMAL) in decimal arithmetic with
    engine-specific scale truncation — e.g. ``1.0 / 27.0`` is
    decimal(8,6) = 0.037037 in Spark but a full double in DuckDB, a
    ~3e-7 coefficient divergence that broke bit-parity. ``repr(x)``
    gives the shortest decimal that round-trips to exactly ``x`` and
    the explicit CAST pins the type, so every arithmetic op below is
    IEEE-754 double (correctly rounded, bit-identical) in both
    engines."""
    return f"CAST({x!r} AS DOUBLE)"


# The correctly-rounded double for ln 2 (repr(math.log(2.0))).
_LN2 = _dbl(0.6931471805599453)

# atanh-series coefficients 1/(2k+1), precomputed in Python (one
# correctly-rounded double division) and emitted as CAST'd double
# literals — never as in-SQL division, whose operand typing differs
# between engines (see _dbl).
_SERIES_ODD = (27, 25, 23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3)


def _horner(u: str) -> str:
    expr = _dbl(1.0 / _SERIES_ODD[0])
    for c in _SERIES_ODD[1:]:
        expr = f"({expr} * {u} + {_dbl(1.0 / c)})"
    return f"({expr} * {u} + {_dbl(1.0)})"


def det_ln_ratio_stages(
    a_sql: str, b_sql: str, out: str = "lpq", scale: int = 1_000_000
) -> list[tuple[str, str]]:
    """Stage list ``[(col_name, sql_expr), ...]`` computing
    ``out = floor(scale * ln(a/b))`` deterministically. ``a_sql`` /
    ``b_sql`` are integer-typed SQL expressions with ``1 <= a <= b``
    and ``b < 2^53``. Later stages reference earlier stage names:
    apply with chained ``withColumn(name, F.expr(sql))`` in Spark, or
    as lateral column aliases in one DuckDB SELECT. Intermediates are
    prefixed ``_det_`` for the caller to drop."""
    stages = [
        ("_det_d", f"CAST({a_sql} AS DOUBLE) / CAST({b_sql} AS DOUBLE)")
    ]
    prev_f, prev_e = None, None
    for i, s in enumerate((32, 16, 8, 4, 2, 1), start=1):
        two_s = _dbl(float(2**s))
        probe = (
            f"(_det_d * {two_s}) < {_dbl(1.0)}"
            if prev_f is None
            else f"((_det_d * {prev_f}) * {two_s}) < {_dbl(1.0)}"
        )
        f_expr = f"CASE WHEN {probe} THEN {two_s} ELSE {_dbl(1.0)} END"
        e_expr = f"CASE WHEN {probe} THEN {_dbl(float(s))} ELSE {_dbl(0.0)} END"
        if prev_f is not None:
            f_expr = f"{prev_f} * ({f_expr})"
            e_expr = f"{prev_e} + ({e_expr})"
        stages.append((f"_det_f{i}", f_expr))
        stages.append((f"_det_e{i}", e_expr))
        prev_f, prev_e = f"_det_f{i}", f"_det_e{i}"
    stages += [
        ("_det_mm", f"(_det_d * {prev_f}) * {_dbl(2.0)}"),
        (
            "_det_t",
            f"(_det_mm - {_dbl(1.0)}) / (_det_mm + {_dbl(1.0)})",
        ),
        ("_det_u", "_det_t * _det_t"),
        ("_det_p", _horner("_det_u")),
        (
            "_det_y",
            f"{_dbl(float(scale))} * (({_dbl(2.0)} * _det_t) * _det_p"
            f" - ({prev_e} + {_dbl(1.0)}) * {_LN2})",
        ),
        (out, "CAST(FLOOR(_det_y) AS BIGINT)"),
    ]
    return stages


def det_ln_ratio_select_sql(
    a_sql: str, b_sql: str, out: str = "lpq", scale: int = 1_000_000
) -> str:
    """The stages as one SELECT-list fragment using lateral column
    aliases (DuckDB and Spark SQL both resolve them left-to-right)."""
    return ", ".join(
        f"{sql} AS {name}"
        for name, sql in det_ln_ratio_stages(a_sql, b_sql, out, scale)
    )


def with_det_ln_ratio(df, a_sql: str, b_sql: str, out: str = "lpq",
                      scale: int = 1_000_000):
    """Append ``out`` to a Spark DataFrame via the shared stages;
    intermediates are dropped before returning."""
    import pyspark.sql.functions as F

    names = []
    for name, sql in det_ln_ratio_stages(a_sql, b_sql, out, scale):
        df = df.withColumn(name, F.expr(sql))
        names.append(name)
    return df.drop(*[n for n in names if n != out])
