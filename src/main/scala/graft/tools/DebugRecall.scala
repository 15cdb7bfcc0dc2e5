package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Throwaway: measure ANN recall at each sf to calibrate the
  * certification thresholds for x29/x30/x31. */
object DebugRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.cosineTopK(q, emb, k = 5).select("query_id", "neighbor_id")
      def recall(ann: org.apache.spark.sql.DataFrame): Long =
        exact.join(ann.select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
            .distinct(), Seq("query_id", "neighbor_id"), "left")
          .agg(expr("sum(coalesce(hit, 0)) * 1000 div count(1)")).head().getLong(0)
      val lsh = Similarity.lshTopK(q, emb, k = 5, numPlanes = 4, numTables = 4)
      val ivf = Similarity.ivfTopK(q, emb, k = 5)
      println(s"RECALL $sf lsh=${recall(lsh)} ivf=${recall(ivf)}")

      // near-dup: exact pair set at >= 400 permille
      graft.functions.GraftFunctions.register(spark)
      val base = emb.select(col("vec_id").as("id"), col("embedding").cast("array<float>").as("v"))
      val exactPairs = base.select(col("id").as("da"), col("v").as("va"))
        .crossJoin(base.select(col("id").as("db"), col("v").as("vb")))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db"),
          floor(call_function("cosine_f32", col("va"), col("vb")) * 1000 + 0.5)
            .cast("long").as("cp"))
        .filter(col("cp") >= 400)
        .select("da", "db")
      val found = Similarity.nearDupPairs(emb, minPermille = 400, numPlanes = 4, numTables = 4)
        .select("da", "db")
      val nExact = exactPairs.count()
      val nFound = found.count()
      val nHit = exactPairs.join(found, Seq("da", "db"), "left_semi").count()
      val fp = nFound - nHit
      println(s"NEARDUP $sf exact=$nExact found=$nFound hit=$nHit fp=$fp recall=${if (nExact > 0) nHit * 1000 / nExact else -1}")
    }
    spark.stop()
  }
}
