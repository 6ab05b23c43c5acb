package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path (SURVEY §4: "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join splitting handles sort-merge joins automatically;
  * salting is the explicit tool for (a) broadcast-ineligible joins
  * against a hot-keyed small-ish side and (b) hot-key aggregations
  * where a single reducer would own one giant group.
  */
object Skew {

  /** The salt expression BOTH utilities use — deterministic (a hash of
    * the row id column, never rand(), so results and partition
    * placement reproduce run to run) and sign-safe (pmod). Factored out
    * so the spread property is testable against the code the operators
    * actually run, not a spec-side re-implementation.
    */
  private[graft] def saltCol(rowIdCol: String, salts: Int): Column =
    pmod(hash(col(rowIdCol)), lit(salts))

  /** Salted equi-join: the skewed (big) side gets a random-but-
    * deterministic salt in [0, salts) derived from a row fingerprint;
    * the other side is replicated `salts` times. The join key becomes
    * (key, salt), spreading each hot key over `salts` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 rowIdCol: String, salts: Int): DataFrame = {
    val salted = big.withColumn("_salt", saltCol(rowIdCol, salts))
    val replicated = small
      .withColumn("_salt", explode(lit((0 until salts).toArray)))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Two-stage salted aggregation for hot grouping keys: stage 1
    * aggregates (key, salt) partial sums — spreading a hot key across
    * `salts` reducers — stage 2 merges the partials per key. Only
    * algebraic aggregates (sum/count/min/max) qualify.
    */
  def saltedSumCount(df: DataFrame, groupKey: String, valueCol: Column,
                     rowIdCol: String, salts: Int): DataFrame = {
    df.withColumn("_salt", saltCol(rowIdCol, salts))
      .groupBy(col(groupKey), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(groupKey))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }
}
