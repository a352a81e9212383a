package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonicalization helpers for oracle-comparable results.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same SQL, so floating-point aggregates must be *bit-identical* across
  * engines. Double summation is order-dependent (Spark's partial/final
  * aggregation and DuckDB's scan order differ), so every SUM over doubles
  * is routed through a DECIMAL cast: the cast is deterministic — both
  * engines round the exact binary value of the double to scale 6 with the
  * same HALF_UP (round-half-away-from-zero) rule, so even doubles that DO
  * fall exactly on a half-boundary at scale 6 (e.g. 2^-7 = 0.0078125)
  * round identically — the decimal sum is exact (order-independent), and
  * the final DECIMAL→DOUBLE cast is correctly rounded in both engines.
  * CanonSpec pins the 2^-k boundary case. DuckDB mirror:
  * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)`.
  */
object Canon {
  val Dec: DecimalType = DecimalType(30, 6)

  def dec(c: Column): Column = c.cast(Dec)

  /** Exact, order-independent sum of a double expression → double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** avg as exact-sum / count — DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Deterministic 2-decimal rounding via decimal cast (Spark `round` and
    * DuckDB `round` disagree on some doubles; casts don't). DuckDB mirror:
    * `CAST(CAST(x AS DECIMAL(30,2)) AS DOUBLE)`. */
  def round2(c: Column): Column = c.cast(DecimalType(30, 2)).cast(DoubleType)

  /** 4-decimal variant for ratios/similarities.
    *
    * Use ONLY where the two engines may compute *different* doubles
    * (multi-op float chains, ln/exp, order-dependent folds). When both
    * engines run the SAME single IEEE op on the same inputs (one
    * division, one multiply) the raw double is already bit-identical —
    * and rounding it can *introduce* divergence: a value within ~1ulp of
    * a .00005 boundary rounds by string-repr in Spark but by ×10⁴
    * arithmetic in DuckDB (observed on 951.3/48 = 19.81874999…). */
  def round4(c: Column): Column = c.cast(DecimalType(30, 4)).cast(DoubleType)

  /** 8-decimal variant for small-magnitude statistics (correlations,
    * ratios in [-1, 1]) where 4 decimals would be too coarse a contract.
    * Safe only while |x|·10⁸ ≪ 2⁵³ (DuckDB's cast computes x·10⁸ in
    * double arithmetic — see the round4 note): keep rounded magnitudes
    * under ~10⁵. */
  def round8(c: Column): Column = c.cast(DecimalType(30, 8)).cast(DoubleType)

  /** Timestamps leave query outputs as formatted strings so parquet
    * physical type / timezone annotations can't break the compare. DuckDB
    * mirror: `strftime(ts, '%Y-%m-%d %H:%M:%S')`. */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
