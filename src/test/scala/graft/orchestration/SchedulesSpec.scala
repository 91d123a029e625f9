package graft.orchestration

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class SchedulesSpec extends AnyFunSuite {

  private val start = LocalDateTime.of(2025, 9, 25, 0, 0)

  test("monthly 25th at 02:00 (monthly_price_paid_data shape)") {
    val s = CronSchedule.parse("0 2 25 * *")
    // catchup=False: three missed months → only the latest is due
    val due = s.dueRuns(
      now = LocalDateTime.of(2026, 1, 10, 12, 0),
      lastRun = Some(LocalDateTime.of(2025, 10, 25, 2, 0)),
      startDate = start, catchup = false)
    assert(due == Seq(LocalDateTime.of(2025, 12, 25, 2, 0)))
    // catchup=True: whole backlog, oldest first
    val backlog = s.dueRuns(
      now = LocalDateTime.of(2026, 1, 10, 12, 0),
      lastRun = Some(LocalDateTime.of(2025, 10, 25, 2, 0)),
      startDate = start, catchup = true)
    assert(backlog == Seq(
      LocalDateTime.of(2025, 11, 25, 2, 0),
      LocalDateTime.of(2025, 12, 25, 2, 0)))
  }

  test("daily at 02:00 (pull_new_sales_list shape)") {
    val s = CronSchedule.parse("0 2 * * *")
    // never ran: due exactly once (latest fire ≤ now)
    val due = s.dueRuns(
      now = LocalDateTime.of(2025, 10, 2, 3, 0),
      lastRun = None, startDate = LocalDateTime.of(2025, 9, 28, 0, 0),
      catchup = false)
    assert(due == Seq(LocalDateTime.of(2025, 10, 2, 2, 0)))
    // now is before today's fire time → yesterday's run is the latest
    val early = s.dueRuns(
      now = LocalDateTime.of(2025, 10, 2, 1, 0),
      lastRun = Some(LocalDateTime.of(2025, 9, 30, 2, 0)),
      startDate = LocalDateTime.of(2025, 9, 28, 0, 0), catchup = false)
    assert(early == Seq(LocalDateTime.of(2025, 10, 1, 2, 0)))
    // already caught up → nothing due
    assert(s.dueRuns(
      now = LocalDateTime.of(2025, 10, 2, 3, 0),
      lastRun = Some(LocalDateTime.of(2025, 10, 2, 2, 0)),
      startDate = LocalDateTime.of(2025, 9, 28, 0, 0),
      catchup = false).isEmpty)
  }

  test("weekly Sunday at 02:00 (rightmove_outcodes shape)") {
    val s = CronSchedule.parse("0 2 * * 0")
    // 2025-09-28 is a Sunday; fires land on Sundays only
    val fires = s.fireTimes(
      LocalDateTime.of(2025, 9, 28, 0, 0), LocalDateTime.of(2025, 10, 13, 0, 0))
    assert(fires == Seq(
      LocalDateTime.of(2025, 9, 28, 2, 0),
      LocalDateTime.of(2025, 10, 5, 2, 0),
      LocalDateTime.of(2025, 10, 12, 2, 0)))
  }

  test("unsupported cron shapes are rejected loudly") {
    intercept[IllegalArgumentException](CronSchedule.parse("*/5 * * * *"))
    intercept[IllegalArgumentException](CronSchedule.parse("0 2 25 1 *"))
    intercept[IllegalArgumentException](CronSchedule.parse("0 2 25 *"))
    // both dom and dow restricted: cron gives OR semantics, this subset
    // would silently AND — must reject, not misfire
    intercept[IllegalArgumentException](CronSchedule.parse("0 2 25 * 0"))
  }

  test("unbounded startDate (LocalDateTime.MIN default) cannot hang dueRuns") {
    val s = CronSchedule.parse("0 2 * * *")
    val now = LocalDateTime.of(2026, 8, 12, 12, 0)
    // catchup=false from the unbounded default: returns promptly with
    // just the latest fire
    val due = s.dueRuns(now, None, LocalDateTime.MIN, catchup = false)
    assert(due == Seq(LocalDateTime.of(2026, 8, 12, 2, 0)))
    // catchup=true: backlog capped at the 200-year sanity floor, not
    // 10^12 days — and a realistic explicit startDate keeps its FULL
    // backlog (no silent truncation for valid inputs)
    val backlog = s.dueRuns(now, None, LocalDateTime.MIN, catchup = true)
    assert(backlog.size <= 73100 && backlog.last == due.head)
    val explicit = s.dueRuns(now, None,
      LocalDateTime.of(2014, 1, 1, 0, 0), catchup = true)
    assert(explicit.head == LocalDateTime.of(2014, 1, 1, 2, 0),
      s"explicit old startDate truncated: ${explicit.head}")
  }

  test("JobSpec catchup without an explicit startDate degrades to latest-only") {
    val spec = JobRegistry.JobSpec("x", _ => Nil,
      schedule = Some(CronSchedule.parse("0 2 * * *")), catchup = true)
    // no startDate given: a multi-decade backlog storm is never the
    // right reading of "catch up from an unspecified beginning"
    val due = spec.dueRuns(LocalDateTime.of(2026, 8, 12, 12, 0), None)
    assert(due == Seq(LocalDateTime.of(2026, 8, 12, 2, 0)))
  }

  test("registered builtins carry the reference DAG metadata; manual DAG never due") {
    JobRegistry.registerBuiltins()
    val monthly = JobRegistry.spec("monthly_price_paid_data").get
    assert(monthly.schedule.contains(CronSchedule(0, 2, Some(25), None)))
    assert(!monthly.catchup && monthly.tags == Set("land_registry", "postgres"))
    val manual = JobRegistry.spec("initial_price_paid_data").get
    assert(manual.dueRuns(LocalDateTime.of(2026, 1, 1, 0, 0), None).isEmpty)
    assert(JobRegistry.spec("rightmove_outcodes").get.schedule
      .contains(CronSchedule(0, 2, None, Some(java.time.DayOfWeek.SUNDAY))))
  }
}
