package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.forecast.SeasonalModel
import graft.forecast.SeasonalModel.Spec

/** Property tests for the forecaster (SURVEY.md §5.4: shape properties on
  * synthetic series, not Prophet bit-equality).
  */
class SeasonalModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Two years of synthetic daily data for two branches: linear trend x
    * multiplicative weekly seasonality (the shape the model class targets).
    */
  def synthetic(): DataFrame = {
    val start = LocalDate.parse("2022-01-01")
    spark.range(0, 730)
      .select(
        date_add(lit(java.sql.Date.valueOf(start)), col("id").cast("int")).as("ds"),
        col("id").cast("double").as("t"))
      .crossJoin(Seq("A", "B").toDF("branch"))
      .withColumn("dow", dayofweek(col("ds")).cast("double"))
      .withColumn(
        "y",
        (lit(50.0) + col("t") * 0.05 + when(col("branch") === "B", 30.0).otherwise(0.0)) *
          (lit(1.0) + lit(0.35) * sin(col("dow") / 7.0 * 2.0 * math.Pi)))
      .select("branch", "ds", "y")
  }

  val spec = Spec(yearlyOrder = 2, weeklyOrder = 3, nChangepoints = 5, ridgeLambda = 0.1)
  val cutoff = LocalDate.parse("2023-10-31")

  test("fit recovers the weekly seasonal shape (in-sample relative error small)") {
    val data = synthetic()
    val models = SeasonalModel.fit(data, spec, cutoff)
    val train = data.filter(col("ds") <= lit(java.sql.Date.valueOf(cutoff)))
    val pred = SeasonalModel.predict(models, train.select("branch", "ds"), spec)
    val err = pred.join(train, Seq("branch", "ds"))
      .select(avg(abs(col("yhat") - col("y")) / col("y")).as("mape"))
      .head().getDouble(0)
    assert(err < 0.08, s"in-sample MAPE $err too high — seasonality not recovered")
  }

  test("out-of-sample forecast tracks the held-out future") {
    val data = synthetic()
    val models = SeasonalModel.fit(data, spec, cutoff)
    val future = data.filter(col("ds") > lit(java.sql.Date.valueOf(cutoff)))
    val pred = SeasonalModel.predict(models, future.select("branch", "ds"), spec)
    val err = pred.join(future, Seq("branch", "ds"))
      .select(avg(abs(col("yhat") - col("y")) / col("y")).as("mape"))
      .head().getDouble(0)
    assert(err < 0.15, s"held-out MAPE $err too high")
  }

  test("forecasts are non-negative and upper bound dominates point forecast") {
    val models = SeasonalModel.fit(synthetic(), spec, cutoff)
    val days = Seq(("A", "2023-11-05"), ("A", "2023-12-31"), ("B", "2023-11-05"))
      .toDF("branch", "ds").withColumn("ds", to_date(col("ds")))
    val pred = SeasonalModel.predict(models, days, spec).cache()
    assert(pred.filter(col("yhat") < 0 || col("yhat_upper") < 0).count() === 0)
    assert(pred.filter(col("yhat_upper") < col("yhat")).count() === 0)
    pred.unpersist()
  }

  test("training cutoff is respected: post-cutoff rows cannot change the fit") {
    val data = synthetic()
    val poisoned = data.unionAll(
      Seq(("A", "2023-11-15", 1e9), ("B", "2023-12-01", 1e9))
        .toDF("branch", "ds", "y").withColumn("ds", to_date(col("ds"))))
    val a = SeasonalModel.fit(data, spec, cutoff).select("branch", "coef", "n")
    val b = SeasonalModel.fit(poisoned, spec, cutoff).select("branch", "coef", "n")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("branches with < 2 training rows are skipped (pretrain_models.py:21)") {
    val tiny = Seq(
      ("solo", "2023-01-01", 5.0),
      ("pair", "2023-01-01", 5.0), ("pair", "2023-01-02", 6.0),
      ("many", "2023-01-01", 5.0), ("many", "2023-01-02", 6.0), ("many", "2023-01-03", 7.0))
      .toDF("branch", "ds", "y").withColumn("ds", to_date(col("ds")))
    val models = SeasonalModel.fit(tiny, Spec(1, 0, 1, ridgeLambda = 1.0), LocalDate.parse("2023-12-31"))
    val branches = models.select("branch").as[String].collect().toSet
    assert(!branches.contains("solo"))
    assert(branches === Set("pair", "many"))
  }

  test("model store round-trips through parquet (O4: branch is a column, not a filename)") {
    val models = SeasonalModel.fit(synthetic(), spec, cutoff)
    val out = java.nio.file.Files.createTempDirectory("graft_models").toString
    SeasonalModel.writeModels(models, out)
    val back = SeasonalModel.readModels(spark, out)
    assert(back.columns.toSeq === models.columns.toSeq)
    assert(back.exceptAll(models).count() === 0 && models.exceptAll(back).count() === 0)
    // predictions from the reloaded store are identical
    val days = synthetic().select("branch", "ds").limit(50)
    val a = SeasonalModel.predict(models, days, spec)
    val b = SeasonalModel.predict(back, days, spec)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("fit is deterministic across runs") {
    val data = synthetic()
    val a = SeasonalModel.fit(data, spec, cutoff)
    val b = SeasonalModel.fit(data, spec, cutoff)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }
}
