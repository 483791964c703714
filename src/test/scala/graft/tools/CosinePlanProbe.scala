package graft.tools

import graft.ops.{Dedup, Similarity}

/** Prints the OPTIMIZED expression trees of the HOF cosine shapes so the
  * rewrite rule can be matched against what the optimizer actually sees. */
object CosinePlanProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.pipeline.SparkTestBase.spark
    import spark.implicits._
    val df = spark.range(4)
      .map(i => (Seq(i.toFloat, 2.0f), Seq(3.0f, i.toFloat)))
      .toDF("v_a", "v_b")
    val pair = df.select(Dedup.verifyCosineHofCol("v_a", "v_b").as("c"))
    println("=== PAIR OPTIMIZED ===")
    println(pair.queryExecution.analyzed.treeString(true))
    val q = Array(0.5f, 0.25f)
    val query = df.select(Similarity.cosineToQueryHof("v_a", q).as("c"))
    println("=== QUERY OPTIMIZED ===")
    println(query.queryExecution.analyzed.treeString(true))
    spark.stop()
  }
}
