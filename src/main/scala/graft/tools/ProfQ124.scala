// quick standalone profiler for q124 stages at sf0.1
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfQ124 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-s)/1e9}%.2f s"); r
    }
    t("warm count")(emb.count())
    val m = t("fit")(graft.ext.Pca.fit(emb))
    val proj = t("project+count")({
      val p = graft.ext.Pca.project(emb, m, m.dim); p.cache(); p.count(); p })
    t("perComp agg")(proj.select(posexplode(col("proj")).as(Seq("j","x")))
      .groupBy("j").agg(sum(col("x").cast("decimal(38,18)")).as("s1"),
        sum((col("x")*col("x")).cast("decimal(38,18)")).as("s2")).count())
    t("whiten project+agg")({
      val wp = graft.ext.Pca.project(emb, m, m.dim, whiten = true)
      wp.select(posexplode(col("proj")).as(Seq("j","x"))).groupBy("j")
        .agg(sum(col("x").cast("decimal(38,18)")).as("s")).count() })
    t("recon join")({
      val orig = emb.select(col("vec_id").as("rid"),
        transform(col("embedding"), _.cast("double")).as("x"))
      graft.ext.Pca.reconstruct(proj, m)
        .join(orig, col("vec_id") === col("rid"))
        .select(aggregate(zip_with(col("recon"), col("x"), (a,b) => abs(a-b)),
          lit(0.0), (acc,e) => greatest(acc,e)).as("err"))
        .filter(col("err") > 1e-6).count() })
    t("full violations")(graft.ext.Pca.violations(emb).count())
    t("full violations again")(graft.ext.Pca.violations(emb).count())
    spark.stop()
  }
}
