"""Engine-stable decimal arithmetic for money/metric columns.

Problem: aggregating 2-decimal quantities as IEEE doubles is
nondeterministic (summation order differs run-to-run on a cluster and
engine-to-engine vs the DuckDB oracle), and rounding products/averages
of decimals lands on exact .xx5 ties where every float-side rounding
scheme is engine-dependent (Spark round = BigDecimal HALF_UP, DuckDB
round = scaled float rounding, Java printf = HALF_UP, glibc printf =
ties-to-even — and ties DO occur exactly: .125/.375/.625/.875 are
binary-representable).

Fix — do ALL arithmetic and the rounding itself in integer space, the
same discipline a 100 TB money pipeline needs for reproducible
aggregates:

1. per row: ``cents(x) = CAST(round(x*100) AS BIGINT)`` — inputs are
   exact 2-decimal quantities, so x*100 is within 1e-9 of an integer
   and both engines round it identically (never near a tie);
2. aggregate the integers — exact, overflow-safe to ~9e18 (use
   DECIMAL(38,0) beyond sf~10 for triple products), and crucially
   ORDER-INDEPENDENT, so any partitioning/summation schedule yields
   the same value;
3. round to cents in integer space, half-up: ``(N + d/2) div d``
   where d = sub-cent units per cent (Spark `div` ≡ DuckDB `//` on
   positive bigints); averages: ``(2·S + n) div (2·n)``;
4. one final ``/ 100.0`` — exact cents < 2^53 divide to a
   bit-identical double in every engine. No float rounding anywhere.

Spark-side helpers below; oracle SQL spells the same formulas with
`//`. Both dialects are deliberately kept visible at each query site
(not macro-generated) so the twin formulas can be eyeballed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact fixed-point: 2-decimal double -> BIGINT hundredths."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("bigint")


def unit_div(expr: str, d: int) -> Column:
    """Half-up integer rounding of `expr` (a bigint column expression in
    1/d-cent units) to cents, then exact /100.0 to double."""
    return F.expr(f"(({expr}) + {d // 2}) div {d}") / 100.0


def avg_div(sum_expr: str, n_expr: str) -> Column:
    """Half-up integer average of cent-sums: round(S/n) in integer space."""
    return F.expr(f"(2 * ({sum_expr}) + ({n_expr})) div (2 * ({n_expr}))") / 100.0
