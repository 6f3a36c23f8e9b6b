"""Z-order (Morton) curve encoding for multi-dimensional clustering.

The reference has no layout optimizer (its sink is a console log,
/root/reference/python/cdc_test/main.py:47); this is the lakehouse-side
companion to S7/S12: cluster a table on the interleaved bits of two
dimensions so file/row-group min-max pruning skips data for predicates on
EITHER dimension — a linear sort narrows only its leading column.

Both engines must compute bit-identical codes, so the interleave is emitted
twice from one spec: `z_interleave` builds the Spark Column, `z_sql` the
equivalent DuckDB expression, each the same OR of masked shifts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16  # bits kept per dimension -> 2*BITS-bit z-value


def z_interleave(u: Column, v: Column, bits: int = BITS) -> Column:
    """Morton-interleave two non-negative `bits`-bit codes: u's bit i lands
    at position 2i+1, v's at 2i. Pure map-side bitwise codegen — no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(u, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def z_sql(u: str, v: str, bits: int = BITS) -> str:
    """The identical interleave as a DuckDB SQL expression (parity oracle)."""
    terms = []
    for i in range(bits):
        # BIGINT-cast each masked bit so a 32-bit operand (e.g. an INT
        # column or literal) can't overflow the << 31 term in DuckDB.
        terms.append(f"(CAST((({u} >> {i}) & 1) AS BIGINT) << {2 * i + 1})")
        terms.append(f"(CAST((({v} >> {i}) & 1) AS BIGINT) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def quantize16(col: Column, lo: Column, hi: Column) -> Column:
    """Min-max normalize a non-negative bigint column to a 16-bit code with
    pure integer arithmetic: (x - lo) * 65536 div (hi - lo + 1). At 100 TB
    lo/hi come from catalog statistics (a 1-row broadcast here). Integer
    division keeps the engines bit-identical where a double divide could
    round across the floor boundary; the exact-quotient form below stays
    integral, so the intermediate double division is exact (numerator is a
    multiple of the denominator, quotient <= 65535 < 2^53)."""
    num = (col - lo) * F.lit(65536)
    den = hi - lo + F.lit(1)
    return ((num - num % den) / den).cast("bigint")


def quantize16_sql(col: str, lo: str, hi: str) -> str:
    # BIGINT-promote before the * 65536: DuckDB INTEGER arithmetic throws on
    # overflow rather than widening, so an INT column whose range exceeds
    # ~32767 would error the oracle while the Spark side (bigint inputs) is
    # fine — the same engine asymmetry z_sql's BIGINT casts exist to avoid.
    return (
        f"((CAST({col} AS BIGINT) - CAST({lo} AS BIGINT)) * 65536 "
        f"// (CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT) + 1))"
    )
