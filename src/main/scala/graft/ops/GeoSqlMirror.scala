package graft.ops

/** DuckDB SQL mirrors for the two binary geo kernels — geohash-7
  * (`expr/GeohashOps.encode`) and WKB point hex (`expr/GeoOps.pointWkb`)
  * — shared by every oracle that replays them ([[Flagship]] `geo_enrich`,
  * [[IngestOps]] `ingest_enrich`).
  *
  * Geohash: a recursive CTE replays the kernel's 35-step interleaved
  * lon/lat bisection. Every midpoint `(lo+hi)/2` is the identical IEEE
  * operation on identical doubles in both engines, so the bit path —
  * and therefore the emitted base-32 string — matches bit-for-bit.
  *
  * WKB hex: the IEEE754 little-endian bytes are reconstructed
  * arithmetically — the exponent by a guarded `floor(log2(a))` (log2
  * itself can round across a power-of-two boundary, hence the two
  * correction branches), the significand by the exact `a * 2^(52-e)`
  * scaling, exact because that product IS the 53-bit significand and
  * fits a BIGINT. Zero is handled explicitly (no -0.0 arises from the
  * coordinate generator formulas: both produce +0.0) and no subnormal
  * branch is needed (|coord| is either exactly 0 or far above the
  * subnormal range).
  */
object GeoSqlMirror {

  /** A `WITH RECURSIVE` clause (no final SELECT): given `p0Body`
    * projecting (`key`, `lat`, `lon`) — column names must be literally
    * `lat`/`lon` — defines `ghs` (`key`, geohash) and `wkb` (`key`,
    * wkb_hex). The caller appends any further CTEs (`s", extra AS
    * (...)"`) and its own final SELECT joining `ghs`/`wkb` on `key`. */
  def ctes(p0Body: String, key: String): String = {
    // exponent of a normal positive double, guarded against log2 rounding
    val e0 = "CAST(floor(log2(a)) AS INT)"
    val eExpr =
      s"""CASE WHEN power(2.0, $e0) > a THEN $e0 - 1
         |     WHEN power(2.0, $e0 + 1) <= a THEN $e0 + 1
         |     ELSE $e0 END""".stripMargin
    s"""WITH RECURSIVE p0 AS (
       |  $p0Body),
       |gh AS (
       |  SELECT $key, lon, lat, 0 AS i,
       |    CAST(-90 AS DOUBLE) AS latlo, CAST(90 AS DOUBLE) AS lathi,
       |    CAST(-180 AS DOUBLE) AS lonlo, CAST(180 AS DOUBLE) AS lonhi,
       |    CAST(0 AS BIGINT) AS bits
       |  FROM p0
       |  UNION ALL
       |  SELECT $key, lon, lat, i + 1,
       |    CASE WHEN i % 2 = 1 AND lat >= (latlo + lathi) / 2
       |      THEN (latlo + lathi) / 2 ELSE latlo END,
       |    CASE WHEN i % 2 = 1 AND lat < (latlo + lathi) / 2
       |      THEN (latlo + lathi) / 2 ELSE lathi END,
       |    CASE WHEN i % 2 = 0 AND lon >= (lonlo + lonhi) / 2
       |      THEN (lonlo + lonhi) / 2 ELSE lonlo END,
       |    CASE WHEN i % 2 = 0 AND lon < (lonlo + lonhi) / 2
       |      THEN (lonlo + lonhi) / 2 ELSE lonhi END,
       |    bits * 2 + CASE WHEN i % 2 = 0
       |      THEN CASE WHEN lon >= (lonlo + lonhi) / 2 THEN 1 ELSE 0 END
       |      ELSE CASE WHEN lat >= (latlo + lathi) / 2 THEN 1 ELSE 0 END END
       |  FROM gh WHERE i < 35),
       |ghs AS (
       |  SELECT $key, array_to_string(list_transform(range(0, 7),
       |    j -> substring('0123456789bcdefghjkmnpqrstuvwxyz',
       |      CAST(((bits >> (5 * (6 - j))) & 31) AS INT) + 1, 1)), '')
       |    AS geohash
       |  FROM gh WHERE i = 35),
       |pv AS (
       |  SELECT $key, 0 AS w, lon AS v FROM p0
       |  UNION ALL
       |  SELECT $key, 1, lat FROM p0),
       |pe AS (
       |  SELECT $key, w, v, a,
       |    CASE WHEN v = 0 THEN 0 ELSE $eExpr END AS e
       |  FROM (SELECT $key, w, v, abs(v) AS a FROM pv)),
       |pm AS (
       |  SELECT $key, w, v,
       |    CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
       |      ELSE (CAST(e + 1023 AS BIGINT) << 52)
       |        | (CAST(a * power(2.0, 52 - e) AS BIGINT)
       |           - (CAST(1 AS BIGINT) << 52)) END AS mbits
       |  FROM pe),
       |ph AS (
       |  SELECT $key, w,
       |    upper(array_to_string(list_transform(range(0, 8),
       |      i -> printf('%02x', ((mbits >> (8 * CAST(i AS INT))) & 255)
       |        + CASE WHEN i = 7 AND v < 0 THEN 128 ELSE 0 END)), ''))
       |      AS hx
       |  FROM pm),
       |wkb AS (
       |  SELECT $key,
       |    '0101000000' || max(CASE WHEN w = 0 THEN hx END)
       |      || max(CASE WHEN w = 1 THEN hx END) AS wkb_hex
       |  FROM ph GROUP BY 1)""".stripMargin
  }
}
