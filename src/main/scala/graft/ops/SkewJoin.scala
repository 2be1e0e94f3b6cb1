package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split isn't available (e.g. the skewed side feeds a
  * non-shuffle operator) or a single key dwarfs every partition.
  *
  * The left (skewed, large) side gets a random salt in [0, salts); the
  * right side is replicated `salts` times with every salt value; the join
  * key becomes (key, salt), spreading one hot key over `salts` reducers.
  * Result rows are identical to the unsalted join.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    // the salt must vary even across IDENTICAL rows (a hot key often
    // consists of duplicate rows), so mix in the per-row physical position;
    // salt assignment is therefore not stable across runs — irrelevant to
    // the output, which equals the unsalted join either way
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*),
        spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
