package graft.orchestration

import java.time.{DayOfWeek, LocalDate, LocalDateTime, LocalTime}

/** W5/T6 — declarative schedule metadata, the engine-side analogue of
  * the reference DAGs' `schedule=` / `catchup=` / `start_date=` kwargs
  * (`dags/monthly_price_paid_data.py:53-55` "0 2 25 * *" catchup=False,
  * `dags/pull_new_sales_list.py:291-293` daily 02:00,
  * `dags/rightmove_outcodes.py:143-145` "0 2 * * 0",
  * `dags/initial_price_paid_data.py:46-48` schedule=None).
  *
  * The engine still does not RUN a clock — "Airflow schedules Spark
  * jobs" stays the architecture (BASELINE.json) — but the metadata plus
  * [[CronSchedule.dueRuns]] makes the scheduler contract executable:
  * an outer loop holding only (now, lastRun) per job can ask exactly
  * which logical runs to launch, with Airflow's catchup semantics.
  *
  * Supported cron shape is the five-field subset the reference uses:
  * fixed minute + hour, and each of day-of-month / day-of-week either
  * `*` or a single fixed value (month must be `*`). That covers
  * monthly-on-the-25th, daily, and weekly DAGs; reject anything fancier
  * loudly rather than misfire silently.
  */
final case class CronSchedule(
    minute: Int,
    hour: Int,
    dayOfMonth: Option[Int],
    dayOfWeek: Option[DayOfWeek]) {

  private def matches(d: LocalDate): Boolean =
    dayOfMonth.forall(_ == d.getDayOfMonth) &&
      dayOfWeek.forall(_ == d.getDayOfWeek)

  /** All fire instants in (after, until], oldest first. */
  def fireTimes(after: LocalDateTime, until: LocalDateTime): Seq[LocalDateTime] = {
    val t = LocalTime.of(hour, minute)
    Iterator.iterate(after.toLocalDate)(_.plusDays(1))
      .takeWhile(!_.isAfter(until.toLocalDate))
      .filter(matches)
      .map(LocalDateTime.of(_, t))
      .filter(ft => ft.isAfter(after) && !ft.isAfter(until))
      .toSeq
  }

  /** Logical runs due now, given the last run launched (None = never).
    *
    * Airflow semantics: with catchup the whole backlog since
    * lastRun/startDate is due, oldest first; without it only the most
    * recent fire time is due (missed intervals are skipped, matching
    * `catchup=False` on all four reference DAGs).
    */
  def dueRuns(
      now: LocalDateTime,
      lastRun: Option[LocalDateTime],
      startDate: LocalDateTime,
      catchup: Boolean): Seq[LocalDateTime] = {
    val after0 = lastRun.filter(_.isAfter(startDate)).getOrElse(startDate)
    // Floor the day-by-day iteration: an unbounded start (e.g. the
    // JobSpec default LocalDateTime.MIN) would otherwise walk the
    // iterator from year -999999999 — an effective hang. Without
    // catchup the floor is RESULT-PRESERVING: only the latest fire is
    // returned and every supported shape fires within any 62-day window
    // (worst gap: dom=31 across a 30-day month ≈ 61 days). With catchup
    // the floor is a 200-year sanity bound — any realistic explicit
    // startDate keeps its full backlog (bounded, fast iteration); only
    // the absurd defaults get clamped.
    val floor = if (catchup) now.minusYears(200) else now.minusDays(62)
    val after = if (after0.isBefore(floor)) floor else after0
    val due = fireTimes(after, now)
    if (catchup) due else due.takeRight(1)
  }
}

object CronSchedule {

  /** Parse the supported five-field subset; None for manual-only
    * (`schedule=None`).
    */
  def parse(expr: String): CronSchedule = {
    val fs = expr.trim.split("\\s+")
    require(fs.length == 5, s"cron '$expr': want 5 fields, got ${fs.length}")
    val Array(m, h, dom, mon, dow) = fs
    require(mon == "*", s"cron '$expr': month field must be *")
    def fixed(s: String, name: String, lo: Int, hi: Int): Option[Int] =
      if (s == "*") None
      else {
        val v = try s.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"cron '$expr': unsupported $name field '$s' (want * or a number)")
        }
        require(v >= lo && v <= hi, s"cron '$expr': $name $v out of [$lo,$hi]")
        Some(v)
      }
    val minute = fixed(m, "minute", 0, 59).getOrElse(
      throw new IllegalArgumentException(s"cron '$expr': minute must be fixed"))
    val hour = fixed(h, "hour", 0, 23).getOrElse(
      throw new IllegalArgumentException(s"cron '$expr': hour must be fixed"))
    // cron 0=Sunday..6=Saturday → java.time (Monday-based, 7=Sunday)
    val week = fixed(dow, "day-of-week", 0, 7)
      .map(v => DayOfWeek.of(if (v == 0 || v == 7) 7 else v))
    val month = fixed(dom, "day-of-month", 1, 31)
    // Vixie cron / Airflow give OR semantics when BOTH dom and dow are
    // restricted; CronSchedule.matches would apply AND — a silent
    // once-every-~7-months misfire instead of 25th-plus-Sundays. Reject
    // the shape loudly (none of the supported DAG schedules use it).
    require(month.isEmpty || week.isEmpty,
      s"cron '$expr': restricting both day-of-month and day-of-week is " +
        "unsupported (cron gives OR semantics there; this subset would " +
        "silently apply AND)")
    CronSchedule(minute, hour, month, week)
  }
}
