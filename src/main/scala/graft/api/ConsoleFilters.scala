package graft.api

import graft.model.Job

/** Console page filters — goose's in-page job filtering re-expressed as
  * one shared validate-then-dispatch module used by BOTH the JSON route
  * table ([[ConsoleRoutes]]) and the HTML pages ([[ConsoleHtml]]), so
  * the two surfaces cannot drift (reference
  * redis/console/data.clj:30-47 filter-enqueued-jobs / 79-128
  * filter-dead-jobs / filter-scheduled-jobs, with the param validation
  * of redis/console/specs.clj:9-20 and the per-page validate-get-jobs
  * in console/pages/enqueued.clj:90-114).
  *
  * Validation semantics mirror the reference exactly:
  *   - `filter-type` outside the page's allowed set validates to None;
  *     with BOTH validated params None the page falls back to plain
  *     pagination (goose `get-all-jobs-request?`).
  *   - a valid `filter-type` with an invalid `filter-value` (bad UUID
  *     for "id", unknown word for "type") renders an EMPTY job list —
  *     not an error (goose `invalid-filter-value?` → `:jobs []`).
  *   - `limit` parses as a non-negative integer, default 10
  *     (goose d/limit, specs ::limit nat-int?).
  *
  * Every filter is a driver-side bounded read (find-by-id or a
  * limit-capped find-by-pattern over one collection) — console traffic
  * is human-scale; none of the data plane passes through here.
  */
object ConsoleFilters {

  val DefaultLimit = 10

  /** Per-page allowed filter types (reference specs.clj:9-11). */
  val EnqueuedTypes: Set[String] = Set("id", "execute-fn-sym", "type")
  val ScheduledTypes: Set[String] = Set("id", "execute-fn-sym", "type", "queue")
  val DeadTypes: Set[String] = Set("id", "execute-fn-sym", "queue")

  /** Legal `filter-value`s for `filter-type=type` (specs.clj:19); each
    * page dispatches only its own subset, exactly as the reference
    * `case` forms do. */
  private val TypeValues = Set("unexecuted", "failed", "scheduled")

  /** A validated filter request: `types`/`value` are None when the raw
    * param was absent OR failed validation. */
  final case class Spec(filterType: Option[String], value: Option[String], limit: Int) {
    /** goose filter-jobs-request?: both validated params present. */
    def isFilter: Boolean = filterType.isDefined && value.isDefined
    /** goose get-all-jobs-request?: both validated params nil → the
      * page serves its normal paginated listing. */
    def isPlainPage: Boolean = filterType.isEmpty && value.isEmpty
  }

  private def isUuid(s: String): Boolean =
    scala.util.Try(java.util.UUID.fromString(s)).isSuccess

  /** Validate raw params against one page's allowed set (the
    * validate-get-jobs shape, pages/enqueued.clj:90-114). `filter-value`
    * validation is keyed on the validated type, so an invalid type
    * yields (None, None) — the reference's silent fallback to the
    * unfiltered page. */
  def validate(params: Map[String, String], allowed: Set[String]): Spec = {
    val ft = params.get("filter-type").filter(allowed.contains)
    val fv = ft.flatMap {
      case "id" => params.get("filter-value").filter(isUuid)
      case "type" => params.get("filter-value").filter(TypeValues.contains)
      case _ => params.get("filter-value") // fn-sym / queue: any string
    }
    val limit = params.get("limit")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .filter(l => l >= 0 && l <= Int.MaxValue)
      .map(_.toInt).getOrElse(DefaultLimit)
    Spec(ft, fv, limit)
  }

  /** goose job/retried? (job.clj:18-19): a failure state is present. */
  private def retried(j: Job): Boolean = j.state.isDefined

  /** data.clj:30-47 filter-enqueued-jobs — `type` dispatches
    * failed/unexecuted only; any other validated value (i.e.
    * "scheduled") renders empty, as the reference's nil branch does. */
  def enqueued(api: ManagementApi, queue: String, spec: Spec): Seq[Job] =
    (spec.filterType.get, spec.value.get) match {
      case ("id", v) => api.enqueuedFindById(queue, v).toSeq
      case ("execute-fn-sym", v) =>
        api.enqueuedFindByPattern(queue, _.executeFnSym == v, spec.limit)
      case ("type", "failed") =>
        api.enqueuedFindByPattern(queue, retried, spec.limit)
      case ("type", "unexecuted") =>
        api.enqueuedFindByPattern(queue, j => !retried(j), spec.limit)
      case _ => Nil
    }

  /** data.clj:109-128 filter-scheduled-jobs — adds `queue`, and `type`
    * dispatches failed/scheduled (a scheduled job that has failed at
    * least once vs one never executed). */
  def scheduled(api: ManagementApi, spec: Spec): Seq[Job] =
    (spec.filterType.get, spec.value.get) match {
      case ("id", v) => api.scheduledFindById(v).toSeq
      case ("execute-fn-sym", v) =>
        api.scheduledFindByPattern(_.executeFnSym == v, spec.limit)
      case ("queue", v) => api.scheduledFindByPattern(_.queue == v, spec.limit)
      case ("type", "failed") => api.scheduledFindByPattern(retried, spec.limit)
      case ("type", "scheduled") =>
        api.scheduledFindByPattern(j => !retried(j), spec.limit)
      case _ => Nil
    }

  /** data.clj:79-88 filter-dead-jobs — id / fn-sym / queue. */
  def dead(api: ManagementApi, spec: Spec): Seq[Job] =
    (spec.filterType.get, spec.value.get) match {
      case ("id", v) => api.deadFindById(v).toSeq
      case ("execute-fn-sym", v) =>
        api.deadFindByPattern(_.executeFnSym == v, spec.limit)
      case ("queue", v) => api.deadFindByPattern(_.queue == v, spec.limit)
      case _ => Nil
    }
}
