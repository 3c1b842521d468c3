package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val p = graft.Tables.part(spark, sf0001).select("p_partkey", "p_brand")
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .select("l_orderkey", "l_partkey", "l_quantity", "p_brand")
    val salted = Scale.saltedJoin(li, p, "l_partkey", "p_partkey", 8)
      .select("l_orderkey", "l_partkey", "l_quantity", "p_brand")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting bounds the max shuffle partition under a 30%-mass hot key") {
    // The actual skew claim, asserted at data level: force ~30% of the
    // events table onto ONE join key (the single-key skew AQE's splitter
    // cannot rebalance on the reduce side of a non-splittable agg/join
    // key), and measure real per-partition row counts of the join
    // output. Unsalted, the hot key's partition must blow past 2× the
    // mean (proving the data really is skewed); salted, every partition
    // must stay within 2× the mean.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // fixed 8-partition shuffle joins, no broadcast, no AQE re-plan:
      // the test measures the raw partitioning, not AQE's patch-ups
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ev = graft.Tables.events(spark, sf001)
        .select(when(col("event_id") % 10 < 3, lit(-1L))
          .otherwise(col("user_id")).as("uid"), col("event_id"))
      val dims = ev.select(col("uid").as("bk")).distinct()
        .withColumn("dim", col("bk") * 2)
      def partitionCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.select(spark_partition_id().as("pid"))
          .groupBy("pid").agg(count(lit(1)).as("n"))
          .select("n").as[Long].collect().toSeq
      val plain = partitionCounts(ev.join(dims, ev("uid") === dims("bk")))
      val salted = partitionCounts(Scale.saltedJoin(ev, dims, "uid", "bk", 8))
      val mean = ev.count().toDouble / 8
      assert(plain.max > 2 * mean,
        s"hot key should overload one partition unsalted: max=${plain.max} mean=$mean")
      assert(salted.max <= 2 * mean,
        s"salted max partition must stay within 2x mean: max=${salted.max} mean=$mean counts=$salted")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("salted join spreads a hot key across salt partitions") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val saltedFact = li.withColumn("__salt",
      pmod(xxhash64(li.columns.map(col).toIndexedSeq: _*), lit(8)))
    val hotKey = li.groupBy("l_partkey").count()
      .orderBy(desc("count"), asc("l_partkey")).head().getLong(0)
    val spread = saltedFact.filter(col("l_partkey") === hotKey)
      .select("__salt").distinct().count()
    assert(spread > 1, s"hot key $hotKey should land in multiple salt groups")
  }

  test("z-value expression matches a reference bit-interleave") {
    def zRef(x: Long, y: Long): Long = {
      var z = 0L
      for (b <- 0 until Scale.ZBits) {
        z |= ((x & 0xffff) >> b & 1) << (2 * b)
        z |= ((y & 0xffff) >> b & 1) << (2 * b + 1)
      }
      z
    }
    val df = spark.range(200).selectExpr(
      "id * 37 % 65536 AS x", "id * 101 % 65536 AS y")
      .selectExpr("x", "y", s"${Scale.zValueSql("x", "y", "div")} AS z")
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1)),
        s"x=${r.getLong(0)} y=${r.getLong(1)}")
    }
  }

  test("z-ordered layout keeps both dimensions' file ranges tight") {
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    val li = graft.Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_suppkey", "l_quantity")
    Scale.writeZOrdered(li, dir, "l_partkey", "l_suppkey", partitions = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // each output file should cover a narrow slice of partkey space
    import org.apache.spark.sql.functions._
    val spans = back
      .select(input_file_name().as("f"), col("l_partkey"))
      .groupBy("f")
      .agg((max("l_partkey") - min("l_partkey")).as("span"))
      .select("span").as[Long].collect()
    val fullSpan = 200 // partkeys at sf0.001
    assert(spans.length >= 4)
    assert(spans.count(_ < fullSpan) >= spans.length / 2,
      s"z-order should narrow most files' key ranges: ${spans.toSeq}")
  }

  test("partitioned layout prunes directories on the partition key") {
    val dir = Files.createTempDirectory("part").toString + "/t"
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"))
    Scale.writePartitioned(ev, dir, Seq("event_type"))
    // hive layout on disk
    val subdirs = Files.list(java.nio.file.Paths.get(dir)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(subdirs)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("event_type=")).toSeq
    assert(names.size >= 4, s"expected hive dirs, got $names")
    // filter on the partition key becomes a PartitionFilter, not a data filter
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"partition filter missing:\n$plan")
    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(q.count() == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    val base = Files.createTempDirectory("buckets").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt LOCATION '" + base + "/bkt.db'")
    val o = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val l = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("n_items"))
    Scale.writeBucketed(o, "bkt.orders_b", s"$base/orders_b", "k", 8)
    Scale.writeBucketed(l, "bkt.lineitem_b", s"$base/lineitem_b", "k", 8)

    // disable auto-broadcast so the planner exercises the bucketed
    // sort-merge path (the 100 TB shape — at that scale neither side
    // broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Scale.bucketedJoin(spark, "bkt.orders_b", "bkt.lineitem_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets; plan:\n$plan")
      assert(joined.count() == o.join(l, "k").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP DATABASE bkt CASCADE")
    }
  }
}
