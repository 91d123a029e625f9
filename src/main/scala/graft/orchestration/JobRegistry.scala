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

  /** Registered job + its scheduler metadata (W5/T6): the Airflow DAG
    * kwargs re-expressed declaratively. `schedule=None` → manual-only.
    */
  final case class JobSpec(
      name: String,
      factory: JobFactory,
      schedule: Option[CronSchedule] = None,
      catchup: Boolean = false,
      startDate: java.time.LocalDateTime = java.time.LocalDateTime.MIN,
      tags: Set[String] = Set.empty) {

    /** Logical runs due at `now` given the last launched run — the
      * executable form of the Airflow catchup contract (see
      * [[CronSchedule.dueRuns]]); manual-only jobs are never due.
      *
      * Catchup requires an EXPLICIT startDate: with the unbounded
      * default there is no defined beginning to catch up from, so the
      * job degrades to latest-only instead of launching a multi-decade
      * backlog storm against the outer scheduler.
      */
    def dueRuns(
        now: java.time.LocalDateTime,
        lastRun: Option[java.time.LocalDateTime]): Seq[java.time.LocalDateTime] = {
      val boundedCatchup =
        catchup && startDate != java.time.LocalDateTime.MIN
      schedule.map(_.dueRuns(now, lastRun, startDate, boundedCatchup))
        .getOrElse(Nil)
    }
  }

  private val jobs = TrieMap[String, JobSpec]()

  def register(name: String, factory: JobFactory): Unit =
    jobs.put(name, JobSpec(name, factory))

  def register(spec: JobSpec): Unit = jobs.put(spec.name, spec)

  def get(name: String): Option[JobFactory] = jobs.get(name).map(_.factory)

  def spec(name: String): Option[JobSpec] = jobs.get(name)

  def names: Seq[String] = jobs.keys.toSeq.sorted

  /** Optional `webhook_url` param → concrete notify sink (S12); absent
    * → no-op, matching jobs' defaults.
    */
  private def notifyOf(p: Map[String, String]): String => Unit =
    p.get("webhook_url").map(WebhookNotify.notifier).getOrElse(_ => ())

  /** The four reference DAGs, pre-registered under their Airflow dag_ids
    * with their declared schedules (the schedule/start_date/catchup/tags
    * kwargs of each reference DAG file; all four run catchup=False).
    */
  def registerBuiltins(): Unit = {
    import java.time.LocalDateTime
    register(JobSpec("initial_price_paid_data",
      p => graft.jobs.PricePaidJobs.initial(p("csv_path"), p("table_root"),
        notifyOf(p)),
      schedule = None, // manual-only backfill DAG
      startDate = LocalDateTime.of(2025, 9, 28, 0, 0),
      tags = Set("land_registry", "postgres")))
    register(JobSpec("monthly_price_paid_data",
      p => graft.jobs.PricePaidJobs.monthly(p("csv_path"), p("table_root"),
        notifyOf(p)),
      schedule = Some(CronSchedule.parse("0 2 25 * *")),
      startDate = LocalDateTime.of(2025, 9, 25, 0, 0),
      tags = Set("land_registry", "postgres")))
    register(JobSpec("pull_new_sales_list",
      p => graft.jobs.ScrapeJobs.pullNewSales(p("pages_path"), p("areas_root"),
        p("sales_root"), p("today").toLong),
      schedule = Some(CronSchedule.parse("0 2 * * *")),
      startDate = LocalDateTime.of(2025, 9, 28, 0, 0),
      tags = Set("rightmove", "sales")))
    register(JobSpec("rightmove_outcodes",
      p => graft.jobs.ScrapeJobs.outcodeEnrich(p("payloads_path"),
        p("areas_root")),
      schedule = Some(CronSchedule.parse("0 2 * * 0")),
      startDate = LocalDateTime.of(2025, 9, 28, 0, 0),
      tags = Set("rightmove", "outcodes")))
    // engine extension, not a reference DAG: the downstream consumer
    // that drains the is_processed work queue pull_new_sales_list
    // feeds (scheduled after the 02:00 producer)
    register(JobSpec("process_sales_list",
      p => graft.jobs.ScrapeJobs.processSales(p("sales_root"),
        p("processed_path"), p("today").toLong),
      schedule = Some(CronSchedule.parse("0 3 * * *")),
      startDate = LocalDateTime.of(2025, 9, 28, 0, 0),
      tags = Set("rightmove", "sales", "consumer")))
    // engine extension: the end-to-end training-corpus pipeline
    // (budgets param shape: "src0:400,src1:300")
    register(JobSpec("build_training_set",
      p => graft.jobs.CorpusJobs.buildTrainingSet(
        p("docs_path"), p("out_root"),
        budgets = p("budgets").split(",").map { kv =>
          val Array(s, b) = kv.split(":"); s -> b.toLong
        }.toMap,
        evalDocsPath = p.get("eval_docs_path")),
      schedule = None, // run on demand / per crawl snapshot
      tags = Set("corpus", "training")))
    // engine extension: crawl archives → documents + link graph +
    // next polite frontier (the upstream of build_training_set)
    register(JobSpec("crawl_ingest",
      p => graft.jobs.CrawlJobs.ingest(
        p("warc_glob"), p("out_root"),
        agent = p.getOrElse("agent", "graftbot"),
        seenPath = p.get("seen_path"),
        robotsPath = p.get("robots_path"),
        nShards = p.getOrElse("n_shards", "256").toInt),
      schedule = None, // run per crawl snapshot
      tags = Set("crawl", "corpus")))
  }
}
