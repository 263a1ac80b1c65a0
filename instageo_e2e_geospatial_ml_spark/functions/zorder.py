"""Z-order (Morton) curve encoding — the space-filling-curve clustering
key that makes skew.write_clustered a 2-D spatial layout.

A single-column range clustering (cell id, packed row-major) gives tight
file ranges along ONE axis only: a query box short in x but tall in y
still touches many files. Interleaving the bits of the two quantized
coordinates (x15 y15 x14 y14 ... x0 y0) makes integer order follow the
Z curve, so any query bbox maps to a small number of contiguous Morton
ranges and parquet min/max stats prune both axes at once — the same
layout trick as Delta/Iceberg Z-ORDER table maintenance, expressed here
as a plain JVM column expression (zero Python in the hot path).

The interleave is the textbook magic-number spread (Morton 1966 /
"Bit Twiddling Hacks"): four mask-and-shift rounds widen a 16-bit int
to 32 bits with zeros between the data bits; x | (y << 1) interleaves.
All ops are bigint shift/and/or — bit-identical in Spark and DuckDB, so
the q74 oracle pins the exact key values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# spread masks for 16 -> 32 bit widening (shift amount, mask) per round
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    for shift, mask in _SPREAD:
        # Column.bitwiseOR, not `|` — PySpark's `|` is boolean OR
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton_key(x: Column | str, y: Column | str) -> Column:
    """Interleave two integer coordinates in [0, 65535] into their 32-bit
    Morton code (bigint column). Out-of-range inputs are masked to their
    low 16 bits — quantize FIRST; silent wraparound of unquantized values
    would scatter the layout, not break correctness of downstream filters
    (the key is a layout hint, never a join key)."""
    xc = (F.col(x) if isinstance(x, str) else x).bitwiseAND(F.lit(0xFFFF))
    yc = (F.col(y) if isinstance(y, str) else y).bitwiseAND(F.lit(0xFFFF))
    return _spread16(xc).bitwiseOR(F.shiftleft(_spread16(yc), 1)).alias("morton")


def morton_sql(x_expr: str, y_expr: str) -> str:
    """The identical computation as ANSI/DuckDB SQL (for oracle twins):
    returns an expression string over `x_expr`/`y_expr`."""

    def spread(e: str) -> str:
        for shift, mask in _SPREAD:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    xs = spread(f"(({x_expr}) & 65535)")
    ys = spread(f"(({y_expr}) & 65535)")
    return f"({xs} | ({ys} << 1))"


# ---------------------------------------------------------------------------
# Geohash — the human-readable Z-order key (Niemeyer 2008, public domain
# algorithm): 15 bisection rounds per axis == floor-quantization to 15
# bits, interleaved lon-first from the MSB, base32-grouped 5 bits/char.
# Precision 6 (30 bits, ~1.2 km x 0.6 km cells) is exactly the 16-bit
# Morton spread above; the same magic-number rounds serve both keys.
# ---------------------------------------------------------------------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash6(lon: Column | str, lat: Column | str) -> Column:
    """Precision-6 geohash string of (lon, lat) degrees, pure JVM column
    ops (quantize -> Morton interleave -> 6 base32 chars). Bisection
    identity: 15 rounds of halving [-90, 90] produce the same bits as
    floor((lat + 90) * 2^15 / 180), so the closed form is exact."""
    lonc = F.col(lon) if isinstance(lon, str) else lon
    latc = F.col(lat) if isinstance(lat, str) else lat
    lon_q = F.least(
        F.floor((lonc + F.lit(180.0)) * F.lit(32768.0) / F.lit(360.0)),
        F.lit(32767),
    )
    lat_q = F.least(
        F.floor((latc + F.lit(90.0)) * F.lit(32768.0) / F.lit(180.0)),
        F.lit(32767),
    )
    # lon occupies the MSB-side (odd-from-LSB) lanes: lon-first interleave
    gh = _spread16(lat_q).bitwiseOR(F.shiftleft(_spread16(lon_q), 1))
    alphabet = F.array(*[F.lit(c) for c in _GH32])
    parts = []
    for k in range(6):
        idx = F.shiftrightunsigned(gh, 30 - 5 * (k + 1)).bitwiseAND(F.lit(31))
        parts.append(F.element_at(alphabet, idx.cast("int") + 1))
    return F.concat(*parts)


def geohash6_sql(lon_expr: str, lat_expr: str) -> str:
    """The identical geohash-6 computation as DuckDB SQL (oracle twin)."""
    lon_q = f"least(CAST(floor((({lon_expr}) + 180.0) * 32768.0 / 360.0) AS BIGINT), 32767)"
    lat_q = f"least(CAST(floor((({lat_expr}) + 90.0) * 32768.0 / 180.0) AS BIGINT), 32767)"

    def spread(e: str) -> str:
        for shift, mask in _SPREAD:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    gh = f"({spread(lat_q)} | ({spread(lon_q)} << 1))"
    chars = ", ".join(
        f"substring('{_GH32}', CAST((({gh}) >> {30 - 5 * (k + 1)}) & 31 AS INTEGER) + 1, 1)"
        for k in range(6)
    )
    return f"concat({chars})"
