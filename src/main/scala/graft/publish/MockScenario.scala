package graft.publish

import org.apache.spark.sql.{DataFrame, SparkSession}

/** §3.2: the mock/scenario path — the reference's own e2e harness
  * (pipeline.py:81-91): a settings flag selects canned
  * trigger/non-trigger scenario payload JSONs and pushes them through
  * the SAME upload path as live runs. Engine form: load the fixture
  * payload files as a one-column DataFrame and feed
  * `Sinks.postPayloads` — identical sink machinery, fixture-driven.
  */
object MockScenario {

  /** Load canned scenario payloads (one JSON document per file). */
  def load(spark: SparkSession, scenarioDir: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(scenarioDir)
      .select(org.apache.spark.sql.functions.col("value").as("payload"))
  }

  /** Drive the canned scenario through the real sink. */
  def run(spark: SparkSession, scenarioDir: String,
          post: String => Unit): Unit =
    Sinks.postPayloads(load(spark, scenarioDir), post)
}
