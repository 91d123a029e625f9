package graft.orchestration

import scala.collection.concurrent.TrieMap

import graft.orchestration.TaskGraph.Task

/** W8 — the engine's analogue of the reference's Airflow plugin
  * registration (`plugins/file_transformer_plugin.py:15-17`,
  * `AirflowPlugin.operators = [...]`): a named registry of job
  * factories, so an outer scheduler ("Airflow schedules Spark jobs")
  * resolves DAGs by name with string parameters.
  */
object JobRegistry {

  type JobFactory = Map[String, String] => Seq[Task]

  private val jobs = TrieMap[String, JobFactory]()

  def register(name: String, factory: JobFactory): Unit = jobs.put(name, factory)

  def get(name: String): Option[JobFactory] = jobs.get(name)

  def names: Seq[String] = jobs.keys.toSeq.sorted

  /** Optional `webhook_url` param → concrete notify sink (S12); absent
    * → no-op, matching jobs' defaults.
    */
  private def notifyOf(p: Map[String, String]): String => Unit =
    p.get("webhook_url").map(WebhookNotify.notifier).getOrElse(_ => ())

  /** The four reference DAGs, pre-registered under their Airflow dag_ids. */
  def registerBuiltins(): Unit = {
    register("initial_price_paid_data", p =>
      graft.jobs.PricePaidJobs.initial(p("csv_path"), p("table_root"),
        notifyOf(p)))
    register("monthly_price_paid_data", p =>
      graft.jobs.PricePaidJobs.monthly(p("csv_path"), p("table_root"),
        notifyOf(p)))
    register("pull_new_sales_list", p =>
      graft.jobs.ScrapeJobs.pullNewSales(p("pages_path"), p("areas_root"),
        p("sales_root"), p("today").toLong))
    register("rightmove_outcodes", p =>
      graft.jobs.ScrapeJobs.outcodeEnrich(p("payloads_path"), p("areas_root")))
  }
}
