package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // skewed: key "hot" holds most rows
  private def skewed = ((1 to 500).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"k${i % 7}", i)))
    .toDF("key", "v")

  test("salted count equals direct groupBy count") {
    val direct = skewed.groupBy("key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Scale.saltedCount(skewed, "key")
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    val dims = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val direct = skewed.join(dims, "key").agg(count(lit(1))).as[Long].collect().head
    val salted = Scale.saltedJoin(skewed, dims, "key").agg(count(lit(1))).as[Long].collect().head
    assert(salted == direct)
    // row-level equality too
    val d = skewed.join(dims, "key").select("key", "v", "label")
      .as[(String, Int, String)].collect().sorted.toSeq
    val s = Scale.saltedJoin(skewed, dims, "key").select("key", "v", "label")
      .as[(String, Int, String)].collect().sorted.toSeq
    assert(s == d)
  }

  test("source quality gate: dup-farm, tiny and junk sources flagged, good kept") {
    val prose = "the cat sat on the mat and it was a fine day for all of the town to see"
    val docs = Seq(
      (1L, "good", prose + " one"), (2L, "good", prose + " two"),
      (3L, "good", prose + " three"), (4L, "good", prose + " four"),
      (5L, "dupfarm", prose), (6L, "dupfarm", prose), (7L, "dupfarm", prose),
      (8L, "dupfarm", prose + " unique"),
      (9L, "tiny", prose), (10L, "tiny", prose + " b"),
      (11L, "junk", "!!! ??? *** ### $$$ %%%"), (12L, "junk", "@@@ &&& ^^^ ||| ~~~"),
      (13L, "junk", "+++ === --- ___ :::"))
      .toDF("doc_id", "source", "text")
    val out = Scale.sourceQualityGate(docs, minDocs = 3L,
      minMeanQuality = 0.3, maxDupRate = 0.3)
      .select("source", "src_docs", "src_dup_micros", "keep_source")
      .distinct().as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("good") == ((4L, 0L, true)))
    assert(out("dupfarm") == ((4L, 500000L, false))) // 2 dups of 4 = 0.5 > 0.3
    assert(out("tiny")._1 == 2L && !out("tiny")._3) // below minDocs
    assert(!out("junk")._3) // mean quality below 0.3
    // gate flags, never drops: every input doc still present
    assert(Scale.sourceQualityGate(docs, 3L, 0.3, 0.3).count() == 13L)
  }

  test("deterministic shuffle: reproducible, seed-sensitive, naive-hash-equal") {
    val docs = (0L until 500L).toDF("doc_id")
    val a = Scale.deterministicShuffle(docs, "doc_id", seed = 7L, shards = 8)
      .select("doc_id", "shuffle_hash", "shard")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Scale.deterministicShuffle(docs, "doc_id", seed = 7L, shards = 8)
      .select("doc_id", "shuffle_hash", "shard")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "same seed must reproduce the identical permutation")
    val c = Scale.deterministicShuffle(docs, "doc_id", seed = 8L, shards = 8)
      .select("doc_id", "shuffle_hash", "shard")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a.map(_._2) != c.map(_._2), "different seed must permute differently")
    // split-multiply hash equals the naive product where it fits
    a.foreach { case (id, h, sh) =>
      assert(h == ((id + 7L) * 2654435761L) % 4294967296L)
      assert(sh == h % 8L)
    }
    // every shard populated, roughly balanced on 500 uniform-ish hashes
    val sizes = a.groupBy(_._3).map(_._2.size)
    assert(sizes.size == 8 && sizes.min > 20, s"sizes=$sizes")
  }

  test("pack manifest is consistent with the bin rollup") {
    val docs = (0L until 60L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val manifest = Scale.packManifest(docs, budgetTokens = 10, shards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    val bins = Scale.packSequences(docs, budgetTokens = 10, shards = 4)
      .select("shard", "bin_id", "n_docs", "total_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // rollup of the manifest equals packSequences exactly
    val rolled = manifest.groupBy(m => (m._1, m._2))
      .map { case (k, ms) => k -> ((ms.length.toLong, ms.map(_._4).sum)) }
    assert(rolled == bins)
    // offsets: first doc of each bin starts below budget; within a bin,
    // each doc starts where the previous ended (contiguous packing)
    manifest.groupBy(m => (m._1, m._2)).values.foreach { ms =>
      val sorted = ms.sortBy(_._3)
      assert(sorted.head._5 < 10L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._5 == a._5 + a._4, s"non-contiguous: $a -> $b")
        case _ =>
      }
    }
  }

  test("hash-keyed ops survive ANSI mode at 100 TB id ranges") {
    // ANSI turns silent Long wrap-around into runtime errors; the Knuth
    // hash's split-multiply discipline exists so ids past ~3.4e9 (where
    // id * 2654435761 overflows) keep working. Run the hash-keyed ops on
    // such ids with ANSI on: any overflow in the plan throws here.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // Long.MaxValue + nonzero seed would overflow the naive id + seed
      // sum before the hash's own mod-2^32 reduction; the pmod-first form
      // is congruent, so it must neither throw here nor change any value
      // the naive form could produce.
      val ids = Seq(1L, 3400000001L, 5000000000L, 1000000000000000L,
        Long.MaxValue).toDF("doc_id")
      val sh = Scale.deterministicShuffle(ids, "doc_id", seed = 5L, shards = 8)
        .as[(Long, Long, Long)].collect()
      assert(sh.length == 5)
      sh.foreach { case (_, h, s) =>
        assert(h >= 0L && h < 4294967296L && s >= 0L && s < 8L)
      }
      val docs = Seq((5000000000L, 1.0), (9999999999L, 2.0), (1L, 3.0))
        .toDF("doc_id", "w")
      val picked = Scale.weightedSample(docs, "doc_id", col("w"), 2).collect()
      assert(picked.length == 2)
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("approx distinct is close to exact") {
    val df = (1 to 2000).map(i => i % 731).toDF("x")
    val approx = Scale.approxDistinct(df, col("x")).as[Long].collect().head
    assert(math.abs(approx - 731) <= 40, s"approx=$approx")
  }

  test("two-phase temperature mixing: identical to naive rank, filter actually prunes") {
    // One big stratum (10k rows) where the phase-1 cutoff bites, one small
    // stratum that degrades to an uncut rank.
    val docs = ((1L to 10000L).map(i => (i, "big")) ++ (20001L to 20030L).map(i => (i, "small")))
      .toDF("doc_id", "lang")
    val naive = {
      val quotas = docs.groupBy("lang")
        .agg(floor(lit(8.0) * sqrt(count(lit(1)))).cast("int").as("quota"))
      val h = pmod($"doc_id" * 2654435761L, lit(4294967296L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(h.asc, $"doc_id".asc)
      docs.withColumn("mix_rank", row_number().over(w))
        .join(quotas, "lang")
        .filter($"mix_rank" <= $"quota")
        .select("lang", "mix_rank", "doc_id", "quota")
    }
    val twoPhase = Scale.temperatureMixSample(docs, "lang")
      .select("lang", "mix_rank", "doc_id", "quota")
    assert(twoPhase.as[(String, Int, Long, Int)].collect().sorted.toSeq ==
      naive.as[(String, Int, Long, Int)].collect().sorted.toSeq)

    // survivor-set bound: phase 1 must cut the big stratum to O(quota)
    // rows BEFORE the rank window (this is the 100 TB skew guarantee) and
    // must never cut below the quota itself.
    val quota = 8 * math.sqrt(10000).toInt // 800
    val cutoff = math.min(4294967296L,
      math.ceil(4294967296.0 * 8.0 * quota / 10000).toLong)
    val survivors = docs.filter($"lang" === "big")
      .filter(pmod($"doc_id" * 2654435761L, lit(4294967296L)) < cutoff)
      .count()
    assert(survivors >= quota, s"phase-1 cut below quota: $survivors < $quota")
    assert(survivors <= 2L * 8 * quota,
      s"phase-1 survivor set not O(margin*quota): $survivors")
    assert(survivors < 10000, "phase-1 filter must actually prune the big stratum")
  }

  test("time-partitioned layout prunes by day and orders by session") {
    val path = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/logs"
    val rows = Seq(
      ("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 2L),
      ("2024-01-02 10:00:00", 1L)).toDF("t", "user_id")
      .withColumn("ts", $"t".cast("timestamp")).drop("t")
    Scale.writeTimePartitioned(rows, "ts", "user_id", path)
    val back = spark.read.parquet(path)
    assert(back.count() == 3)
    // day-partition pruning: the day predicate becomes a PartitionFilter,
    // not a data filter (inputFiles reflects the pre-pruning index, so
    // assert on the executed plan instead)
    val oneDay = back.filter($"_day" === "2024-01-01")
    assert(oneDay.count() == 2)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_day"))
  }

  test("bucketed layout joins without any shuffle exchange") {
    val facts = (1 to 200).map(i => (i.toLong % 40, s"f$i")).toDF("k", "a")
    val dims = (1 to 200).map(i => (i.toLong % 40, i)).toDF("k", "b")
    Scale.writeBucketed(facts, "graft_bkt_a", "k", 8)
    Scale.writeBucketed(dims, "graft_bkt_b", "k", 8)
    try {
      val a = spark.table("graft_bkt_a")
      val b = spark.table("graft_bkt_b")
      // force the join to be non-broadcast so the shuffle question is real
      val joined = a.hint("merge").join(b, "k")
      assert(joined.count() == 200L * 200 / 40)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}

class GraftExtensionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("cosine_sim is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s")
      .as[Double].collect().head
    assert(out == 1.0)
  }

  test("weighted sample: reproducible, weight-proportional, zero-weight excluded") {
    // 200 heavy rows (w=10) vs 200 light (w=0.1): heavy ids must dominate
    // the sample; zero-weight rows must never appear; rerun is identical.
    val rows = ((0L until 200L).map(i => (i, 10.0)) ++
      (200L until 400L).map(i => (i, 0.1)) ++
      (400L until 410L).map(i => (i, 0.0))).toDF("id", "w")
    def run() = Scale.weightedSample(rows, "id", col("w"), k = 50)
      .select("id").as[Long].collect().toSeq
    val got = run()
    assert(got.size == 50)
    assert(got.toSet.intersect((400L until 410L).toSet).isEmpty, "zero-weight sampled")
    val heavy = got.count(_ < 200L)
    assert(heavy >= 40, s"heavy ids underrepresented: $heavy/50")
    assert(run() == got, "weighted sample not reproducible")
  }

  test("knuthHash32: equals the naive product where defined, safe at huge ids") {
    // ids small enough that id * 2654435761 fits a Long: the split form
    // must be value-identical to the naive form the oracle SQL uses
    val small = (Seq(0L, 1L, 7L, 999L, 123456789L, 3000000000L)).toDF("id")
    val both = small.select(
      Scale.knuthHash32(col("id")).as("split"),
      pmod(col("id") * 2654435761L, lit(4294967296L)).as("naive"))
      .as[(Long, Long)].collect()
    both.foreach { case (s, n) => assert(s == n, s"split $s != naive $n") }
    // ids where the naive product overflows Long (id > ~3.47e9): the
    // split form must still produce an in-range, deterministic value and
    // agree with exact BigInt arithmetic
    val huge = Seq(4000000000L, 123456789012345L, Long.MaxValue - 1).toDF("id")
    val out = huge.select(col("id"), Scale.knuthHash32(col("id")).as("h"))
      .as[(Long, Long)].collect()
    out.foreach { case (id, h) =>
      val expect = ((BigInt(id) % BigInt(2).pow(32)) * BigInt(2654435761L))
        .mod(BigInt(2).pow(32)).toLong
      assert(h == expect, s"id $id: $h != $expect")
      assert(h >= 0 && h < 4294967296L)
    }
  }

  test("extension class injects the function at builder time") {
    // unit-level: applying the extension to a fresh extensions container
    // must not throw (builder-time integration is config-driven)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
  }

  test("parallelismFloor: fans out narrow inputs, leaves wide inputs and rows untouched") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    // narrow: a coalesced single-partition frame gets floored to par
    val narrow = (1 to 100).toDF("x").coalesce(1)
    val floored = Scale.parallelismFloor(narrow)
    assert(floored.rdd.getNumPartitions == par, "narrow input must fan out")
    assert(floored.agg(org.apache.spark.sql.functions.sum("x")).as[Long].head == 5050L)
    // wide: an input already at >= par partitions is returned AS IS —
    // the no-op guarantee the 100 TB story rests on (no inserted shuffle)
    val wide = (1 to 100).toDF("x").repartition(par)
    assert(Scale.parallelismFloor(wide) eq wide, "wide input must pass through unchanged")
  }

  test("parallelismFloor: plan-derived split count — no job, shuffle lineage untouched") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft-floor-scan").toString
    (1 to 50).toDF("x").coalesce(1).write.mode("overwrite").parquet(dir)
    // a single-file parquet scan = one split -> floored; the decision
    // itself must launch NO Spark job (the r8-flagged df.rdd path could
    // materialize upstream AQE stages just to count partitions). The
    // frame is built OUTSIDE the audited region — parquet schema
    // inference runs its own small job, which is the reader's cost, not
    // the floor's.
    val scan = spark.read.parquet(dir)
    scan.schema
    val sc = spark.sparkContext
    sc.setJobGroup("floor-audit", "parallelismFloor job audit")
    val floored = try Scale.parallelismFloor(scan)
                  finally sc.clearJobGroup()
    Thread.sleep(2000) // status store ingests listener events async
    assert(sc.statusTracker.getJobIdsForGroup("floor-audit").isEmpty,
      "deciding the floor must not run a job")
    assert(floored.rdd.getNumPartitions == par, "one-split scan must fan out")
    // any shuffle already in the lineage fans out downstream — the floor
    // must pass the frame through IDENTICALLY (this is also why a second
    // floor above an already-floored frame is structurally free)
    val agged = spark.read.parquet(dir).groupBy("x").count()
    assert(Scale.parallelismFloor(agged) eq agged,
      "shuffle-rooted frame must pass through unchanged")
    val refloored = Scale.parallelismFloor(floored)
    assert(refloored eq floored, "second floor must be the identity")
  }
}
