package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-join utilities: key-salting for skewed equi-joins.
  *
  * AQE's skew-join handles most runtime skew, but it only splits partitions
  * of the SHUFFLE — a single pathological key (one customer id carrying 10%
  * of a 100 TB fact table) still lands every row of that key in one task's
  * sort buffer. Salting splits the key itself: the fact side gets a
  * deterministic salt in [0, salt), the dimension side is replicated once
  * per salt value, and the join key becomes (key, salt). Result is
  * row-for-row identical to the plain equi-join (verified by a property
  * test); cost is `salt`× replication of the SMALL side only.
  */
object Joins {

  /** Inner equi-join of `big` (skewed side) with `small` (replicated side)
    * on `keys`, with the big side split `salt` ways per key. The salt is a
    * deterministic hash of the big side's full row, so re-runs and retries
    * assign identically. Output columns = big.* ++ (small.* minus keys),
    * like a plain `big.join(small, keys)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(keys.nonEmpty, "keys must be non-empty")
    val b = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
