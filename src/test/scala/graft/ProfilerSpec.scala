package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Profiler

/** Golden + property tests for the profiler (SURVEY.md §5.2 items 2-3). */
class ProfilerSpec extends SparkSuite {

  test("histogram counts per column sum to table rowcount") {
    val hist = Profiler.profileHistogram(spark, sf)
    val sums = hist.groupBy("tableName", "columnName")
      .agg(sum(col("num_records").cast("long")).as("total"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (t <- Tables.all) {
      val n = Tables.load(spark, sf, t.name).count()
      for (c <- t.atomicCols)
        assert(sums((t.name, c.name)) === n, s"${t.name}.${c.name}")
    }
  }

  test("len equals length(value)") {
    val bad = Profiler.profileHistogram(spark, sf)
      .filter(col("len") =!= length(col("value")).cast("float"))
      .count()
    assert(bad === 0)
  }

  test("as-built variant reproduces the reference bug: value == columnName") {
    val bad = Profiler.profileHistogramAsBuilt(spark, sf)
      .filter(col("value") =!= col("columnName")).count()
    assert(bad === 0)
  }

  test("catalog path: temp-view-registered fixtures profile identically") {
    // the reference discovers tables via `show tables` (dbc cmd7); the
    // engine's analog is Tables.fromCatalog + the catalog: dir sentinel.
    // Same data registered as temp views must produce the same profile.
    for (n <- Seq("region", "nation"))
      Tables.load(spark, sf, n).createOrReplaceTempView(n)
    val metas = Tables.fromCatalog(spark, Seq("region", "nation"))
    assert(metas.map(_.name) === Seq("nation", "region"))
    assert(metas.find(_.name == "nation").get.cols ===
      Tables.meta("nation").cols, "catalog metadata matches the declared registry")
    val declared = Profiler.histogramAgg(spark, sf,
      Seq(Tables.meta("nation"), Tables.meta("region"))).collect().toSet
    val viaCatalog = Profiler.histogramAgg(spark, Tables.CatalogDir, metas)
      .collect().toSet
    assert(viaCatalog === declared, "catalog-path profile must be identical")
  }

  test("profiler is idempotent (same result on re-run)") {
    val a = Profiler.profileHistogram(spark, sf, Seq(Tables.meta("nation")))
    val b = Profiler.profileHistogram(spark, sf, Seq(Tables.meta("nation")))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("melt retains NULL cells (pins Dataset.unpivot include-nulls behavior)") {
    // SQL UNPIVOT drops NULL cells by default; the profiler relies on
    // Dataset.unpivot KEEPING them (n_null / NULL histogram rows). Fixtures
    // have no NULLs, so pin the behavior on a doctored copy of nation.
    val tmp = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    Tables.load(spark, sf, "nation")
      .withColumn("n_name", when(col("n_nationkey") % 5 === 0, lit(null: String))
        .otherwise(col("n_name")))
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    val expectNulls = Tables.load(spark, tmp, "nation")
      .filter(col("n_name").isNull).count()
    assert(expectNulls > 0)

    val hist = Profiler.profileHistogram(spark, tmp, Seq(Tables.meta("nation")))
    val nullRow = hist.filter(col("columnName") === "n_name" && col("value").isNull)
      .collect()
    assert(nullRow.length === 1)
    assert(nullRow(0).getAs[Float]("num_records") === expectNulls.toFloat)

    val summary = Profiler.profileSummary(spark, tmp, Seq(Tables.meta("nation")))
      .filter(col("columnName") === "n_name").collect()
    assert(summary(0).getAs[Long]("n_null") === expectNulls)
  }

  test("schemaInformation matches declared metadata (SchemaInformation contract)") {
    val got = Profiler.schemaInformation(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    val want = (for (t <- Tables.all; c <- t.cols) yield (t.name, c.name, c.sparkType)).toSet
    assert(got === want)
  }

  test("runtime parquet schema agrees with Tables metadata") {
    for (t <- Tables.all) {
      val fields = Tables.load(spark, sf, t.name).schema.fields
        .map(f => (f.name, f.dataType.sql.toLowerCase)).toSeq
      assert(fields === t.cols.map(c => (c.name, c.sparkType)), t.name)
    }
  }

  test("refreshTable incrementally updates one table's slice of the histogram") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-refresh").toString
    val nation = Seq(Tables.meta("nation"))
    Tables.load(spark, sf, "nation")
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    // materialize the initial profile
    val before = Profiler.profileHistogram(spark, tmp, nation).count()
    // the table changes: drop region 0's nations (an upsert-shaped delta)
    Tables.load(spark, sf, "nation").filter(col("n_regionkey") =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    Profiler.refreshTable(spark, tmp, "nation", nation)
    val refreshed = Profiler.profileHistogram(spark, tmp, nation)
      .collect().map(r => (r.getString(2), r.getString(4), r.getFloat(5))).toSet
    // ground truth: cold recompute on the new data
    graft.engine.Materialize.invalidate()
    val cold = Profiler.profileHistogram(spark, tmp, nation)
      .collect().map(r => (r.getString(2), r.getString(4), r.getFloat(5))).toSet
    assert(refreshed === cold)
    assert(refreshed.size < before)
    graft.engine.Materialize.invalidate()
  }
}
