package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers — the hot-key survival kit for 100 TB
  * joins (AQE's skew-join splitting covers sort-merge joins at runtime;
  * salting is the plan-level tool when a key's rows must be split
  * before a hash shuffle, e.g. a power-law user_id).
  */
object Skew {

  /** Salted equi-join: the (big, skewed) left side gets a deterministic
    * salt in [0, n) derived from its full row content; the right side is
    * replicated n times, once per salt. The join key becomes (key, salt),
    * splitting each hot key's rows across n reducers.
    *
    * Cost model: right side inflates ×n through the shuffle — choose n
    * ≈ (hot-key rows / target partition rows), keep n small. Result is
    * row-for-row identical to the unsalted join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    // round-robin salt: ANY salt value joins correctly (the right side
    // is replicated for every salt), so the salt's only job is to
    // spread rows — a content hash would send identical duplicate rows
    // of a hot key to one reducer, exactly the case salting exists to
    // fix. monotonically_increasing_id is distinct per row regardless
    // of content; correctness under task retry is preserved because the
    // join matches every salt value.
    val salted = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key)).drop("_salt")
  }
}
