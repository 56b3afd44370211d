package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit salted equi-join for skewed keys.
 *
 * When one join key dominates (a "whale" customer, a null-ish default
 * id), a hash join sends every matching row to one reducer. AQE's skew
 * handling splits oversized SHUFFLE partitions, but only for sort-merge
 * joins after the fact; salting fixes the layout by construction and
 * also works for storage-partitioned data.
 *
 * Mechanics: the BIG side appends a deterministic per-row salt in
 * [0, buckets); the SMALL side is replicated `buckets`× (explode on a
 * salt range). The join key becomes (key, salt), spreading each hot key
 * over `buckets` reducers. Cost: small side shuffles ×buckets — cheap
 * when small ≪ big, which is exactly the skew scenario.
 */
object SkewJoin {

  /**
   * @param big      the large (skewed) side
   * @param small    the side to replicate
   * @param bigKey   join key column on `big`
   * @param smallKey join key column on `small`
   * @param saltSrc  deterministic per-row expression on `big` used to
   *                 derive the salt (e.g. a unique id); hashed mod buckets
   * @param buckets  salt fan-out
   */
  def saltedEquiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltSrc: Column, buckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
