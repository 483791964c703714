package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The Iceberg-bucket(url) story, demonstrated locally with Spark bucketed
  * tables: url-keyed dedup/joins over a `bucketBy(url)` table plan WITHOUT
  * a shuffle exchange on the payload side (SURVEY §4.2). */
class BucketedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("url-keyed window over a bucketed pages table plans without Exchange") {
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    PagesGen.pages(spark, 200L)
      .write.bucketBy(8, "url").sortBy("url")
      .option("path", java.nio.file.Files.createTempDirectory("graft_bucket").toString)
      .saveAsTable("pages_bucketed")

    val t = spark.table("pages_bucketed").as[PageRow]
    val latest = Extract.latestPerUrlWindow(t)
    val plan = latest.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle:\n${plan.take(1500)}")
    // correctness unchanged vs the generic path
    assert(latest.count() == Extract.latestPerUrl(t).count())
  }

  test("bucketed self-join on url avoids both exchanges") {
    val t = spark.table("pages_bucketed")
    val a = t.select($"url", $"warc_ts")
    val b = t.select($"url".as("url2"), length($"html").as("sz"))
    val joined = a.join(b, a("url") === b("url2")).withColumn("j", lit(1))
    val plan = joined.queryExecution.executedPlan.toString
    // broadcast is fine; a url-keyed SHUFFLE is what bucketing must avoid
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle:\n${plan.take(1500)}")
    assert(joined.count() > 0)
  }
}
