"""Exact integer HALF_UP rounding — the MONEY.md `integer` class, shared.

``round(num/den, k)`` for positive integer ``den`` is computed as ONE
integer expression that both engines evaluate identically:

    (2 * 10^k * num + den) div (2 * den)

yielding the value scaled by 10^k as a bigint (ppm for k=6, e4 for
k=4).  Spark's decimal-exact HALF_UP ``round(double, k)`` and DuckDB's
FP-multiply rounding diverge whenever the true rational sits exactly on
a 10^-k half (the r04 rolling_spend / r05 domain_mix incident class);
this form never touches a double until the caller's final ``/ 10^k.0``,
which maps the same bigint to the same double everywhere.

Centralized here (r06 review finding) so the overflow discipline is
derived once instead of per hand-expanded site:

- Both operands are cast to ``width`` OUTSIDE the scale multiply, so an
  int-typed source column (``F.size``, a ``cast('int')`` count) can
  never wrap int32 under non-ANSI Spark when ``2*10^k*num`` exceeds
  2^31.
- Product NUMERATORS must still pre-cast their first factor in the SQL
  fragment they pass (``cast(_d as bigint) * (_n - _s)``): the helper's
  outer cast applies after the product's own arithmetic, which would
  otherwise already have wrapped.
- ``width="decimal(38,0)"`` is the wide carrier for operands that can
  exceed int64 at scale (corpus-total token counts); the result is cast
  back to bigint, which the quotient — a ratio at 10^k scale — always
  fits.

Every Spark-side site now routes through this helper (the final seven
hand-expanded sites converted with the r06 window refresh); the DuckDB
twins keep the algebra written out in SQL, where it is the portable
form both engines share.
"""
from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up_scaled(num_sql: str, den_sql: str, scale: int,
                   width: str = "bigint") -> Column:
    """``round(num/den, log10(scale))`` scaled by ``scale``, as a bigint
    Column; exact for positive integer-valued operands. ``num_sql`` /
    ``den_sql`` are Spark SQL fragments (column names or expressions
    resolvable in the calling DataFrame)."""
    n = f"cast(({num_sql}) as {width})"
    d = f"cast(({den_sql}) as {width})"
    return F.expr(
        f"cast((2 * {scale} * {n} + {d}) div (2 * {d}) as bigint)"
    )
