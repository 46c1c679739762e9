package graft

import graft.operators.Sharding
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite with SparkSpec {

  test("shard assignment is deterministic, complete and balanced") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    def assignment(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Sharding.assign(df, $"doc_id", 8)
        .select($"doc_id", $"shard_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = assignment(docs)
    val b = assignment(docs.repartition(13, $"text"))
    assert(a == b, "shard assignment changed under repartitioning")
    assert(a.values.forall(s => s >= 0 && s < 8))
    val n = a.size
    assert(a.values.toSet.size == 8, "every shard should be hit")
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).values
    // binomial balance: no shard more than 2x the mean at this n
    assert(sizes.max < 2.0 * n / 8, s"skewed shards: ${sizes.toList.sorted}")
  }

  test("shard and position channels are independent md5 streams") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id")
    val rows = Sharding.assign(docs, $"doc_id", 8)
      .select($"shard_id", $"shuffle_key",
        Sharding.shardOf($"doc_id", 8).as("again"))
      .collect()
    // same doc re-hashes to the same shard…
    assert(rows.forall(r => r.getLong(0) == r.getLong(2)))
    // …and the position key never equals the shard channel's md5
    val shardMd5 = Sharding.assign(docs, $"doc_id", 8)
      .select(md5(concat(lit("shard:"), $"doc_id".cast("string"))))
      .collect().map(_.getString(0)).toSet
    assert(rows.forall(r => !shardMd5.contains(r.getString(1))),
      "pos: channel collided with shard: channel")
  }

  test("positions are a 1..n permutation per shard, stable across runs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id")
    val p1 = Sharding.withPositions(docs, $"doc_id", 4)
      .select($"shard_id", $"shuffle_pos", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p2 = Sharding.withPositions(docs.repartition(7), $"doc_id", 4)
      .select($"shard_id", $"shuffle_pos", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p1.sorted.sameElements(p2.sorted),
      "shuffle order changed under repartitioning")
    p1.groupBy(_._1).foreach { case (shard, rows) =>
      val pos = rows.map(_._2).sorted
      assert(pos.sameElements(1L to rows.length),
        s"shard $shard positions are not a contiguous 1..n")
    }
    // intra-shard order differs from plain key order (it is shuffled)
    val anyShard = p1.groupBy(_._1).values.maxBy(_.length)
    val byPos = anyShard.sortBy(_._2).map(_._3)
    assert(!byPos.sameElements(byPos.sorted), "shuffle order == key order")
  }

  test("manifest totals partition the corpus totals exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val m = Sharding.manifest(docs, $"doc_id", 8,
      Seq("sum_chars" -> $"n_chars")).collect()
    val total = docs.agg(sum($"n_chars"), count(lit(1))).head()
    assert(m.map(_.getLong(1)).sum == total.getLong(1), "doc counts")
    assert(m.map(_.getLong(2)).sum == total.getLong(0), "char mass")
  }

  test("sharded export writes byte-identical shards across runs") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")

    def export(out: String): Map[String, Seq[String]] = {
      // the export plan: assign + order, ONE exchange on shard_id (the
      // write partitioning), write order = shuffle order
      val positioned = Sharding.withPositions(docs, $"doc_id", 4)
        .repartition(col("shard_id"))
        .sortWithinPartitions(col("shard_id"), col("shuffle_pos"))
      graft.etl.PartitionedWriter.write(positioned, out,
        partitionKeys = Seq("shard_id"))
      // per shard dir: md5 of each data file's bytes, sorted
      val root = Paths.get(out)
      import scala.jdk.CollectionConverters._
      Files.list(root).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("shard_id="))
        .map { dir =>
          val hashes = Files.list(dir).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map { f =>
              val md = java.security.MessageDigest.getInstance("MD5")
              java.util.HexFormat.of().formatHex(
                md.digest(Files.readAllBytes(f)))
            }.toSeq.sorted
          dir.getFileName.toString -> hashes
        }.toMap
    }

    val a = export("target/shard-export-a")
    val b = export("target/shard-export-b")
    assert(a.keySet == (0 until 4).map(i => s"shard_id=$i").toSet)
    assert(a == b, "re-export produced different shard bytes")
  }

  test("interleave prefix tracks the target weights and is deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang")
    val weights = Map("en" -> 5, "de" -> 2, "es" -> 2, "fr" -> 1, "zh" -> 1)
    val k = 22 // two full lcm cycles: 2 * (5+2+2+1+1) = 22
    val pre = Sharding.interleavePrefix(docs, $"lang", $"doc_id", weights, k)
      .select($"interleave_pos", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(pre.map(_._1).sameElements(1L to k), "positions not contiguous")
    // after two complete cycles every group has emitted exactly 2*w rows
    val counts = pre.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    weights.foreach { case (g, w) =>
      assert(counts.getOrElse(g, 0) == 2 * w,
        s"group $g: got ${counts.getOrElse(g, 0)}, want ${2 * w} ($counts)")
    }
    // deterministic under repartitioning
    val again = Sharding.interleavePrefix(
        docs.repartition(9), $"lang", $"doc_id", weights, k)
      .select($"interleave_pos", $"doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val first = Sharding.interleavePrefix(docs, $"lang", $"doc_id", weights, k)
      .select($"interleave_pos", $"doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(first.sameElements(again), "prefix changed under repartitioning")
  }

  test("an unrepresentable weight lcm fails loudly instead of corrupting strides") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang")
    // large pairwise-coprime weights whose lcm overflows Long: the old
    // unchecked fold would wrap silently and emit a wrong interleave
    val primes = Seq(2147483647, 2147483629, 2147483587)
    val weights = Map("en" -> primes(0), "de" -> primes(1), "es" -> primes(2))
    val e = intercept[IllegalArgumentException] {
      Sharding.interleavePrefix(docs, $"lang", $"doc_id", weights, 10)
    }
    assert(e.getMessage.contains("overflows Long"))
  }
}
