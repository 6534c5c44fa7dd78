package graft.queue

/** Spark-application status resolution — the reference's app-status
  * state machine for externally-launched Spark jobs
  * (spark_application_template.go:267-412 `Resolve`/`sortedTransitions`/
  * `TransitionResults`; state classification
  * service_maintenance_executor_spark.go:550-601).
  *
  * An application's reported status is messy: the live `currentState`
  * may be empty, a terminal *wrapper* state (resources released) may
  * hide the real outcome, and the transition history is a map keyed by
  * stringified ordinals. `resolve` turns that into a stable
  * (currentState, outcomeState, message) triple:
  *
  *  - wrapper current state → outcome is the latest failure, else the
  *    latest success, else the latest non-wrapper terminal transition;
  *  - empty current state → the latest non-wrapper terminal, else the
  *    latest meaningful transition;
  *  - missing message → backfilled from whichever transition supplied
  *    the outcome state.
  */
object AppStatus {

  /** One reported state (SparkApplicationState, go:38-43): `summary`
    * prefers the operator's human summary over the raw state. */
  final case class AppState(
      state: String = "",
      currentStateSummary: String = "",
      message: String = "",
      lastTransitionTime: String = "") {
    def summary: String = firstNonEmpty(currentStateSummary, state)
  }

  /** The raw status payload (SparkApplicationStatus, go:31-36). */
  final case class Status(
      applicationState: AppState = AppState(),
      currentState: AppState = AppState(),
      stateTransitionHistory: Map[String, AppState] = Map.empty,
      errorMessage: String = "")

  /** The resolved triple (ResolvedSparkApplicationStatus, go:45-49). */
  final case class Resolved(currentState: String, outcomeState: String, message: String) {
    def state: String = firstNonEmpty(outcomeState, currentState)
    def isTerminal: Boolean =
      isTerminalState(currentState) || isTerminalState(outcomeState)
    def isSuccess: Boolean = isSuccessState(state)
  }

  final case class Transition(state: String, message: String, timestamp: String)

  private def firstNonEmpty(values: String*): String =
    values.find(_.nonEmpty).getOrElse("")

  def normalize(state: String): String = state.trim.toUpperCase

  /** COMPLETED/SUCCEEDED (go:568-575). */
  def isSuccessState(state: String): Boolean =
    Set("COMPLETED", "SUCCEEDED")(normalize(state))

  /** FAILED/SUBMISSIONFAILED/SUBMISSION_FAILED/FAILING (go:577-584). */
  def isFailureState(state: String): Boolean =
    Set("FAILED", "SUBMISSIONFAILED", "SUBMISSION_FAILED", "FAILING")(normalize(state))

  /** Terminal wrappers that hide the real outcome (go:586-593). */
  def isTerminalWrapperState(state: String): Boolean =
    Set("TERMINATEDWITHOUTRELEASERESOURCES", "RESOURCERELEASED")(normalize(state))

  def isTerminalState(state: String): Boolean =
    isSuccessState(state) || isFailureState(state) || isTerminalWrapperState(state)

  /** History entries ordered by key: numeric keys first, ascending
    * numerically; non-numeric keys after, ascending lexicographically
    * (go:349-377 sortedTransitions). */
  def sortedTransitions(history: Map[String, AppState]): Seq[AppState] =
    history.toSeq.sortWith { case ((a, _), (b, _)) =>
      (a.toIntOption, b.toIntOption) match {
        case (Some(x), Some(y)) => x < y
        case (Some(_), None) => true
        case (None, Some(_)) => false
        case (None, None) => a < b
      }
    }.map(_._2)

  /** The resolution state machine (go:267-341). */
  def resolve(s: Status): Resolved = {
    val currentState = firstNonEmpty(s.currentState.summary, s.applicationState.summary)
    val currentMessage = firstNonEmpty(s.currentState.message, s.errorMessage)

    var latestMeaningful = AppState()
    var latestFailure = AppState()
    var latestSuccess = AppState()
    var latestTerminal = AppState()
    sortedTransitions(s.stateTransitionHistory).foreach { t =>
      val state = t.summary
      if (state.nonEmpty) {
        latestMeaningful = t
        if (isFailureState(state)) latestFailure = t
        if (isSuccessState(state)) latestSuccess = t
        if (isTerminalState(state) && !isTerminalWrapperState(state)) latestTerminal = t
      }
    }

    var outcomeState = currentState
    var outcomeMessage = currentMessage
    if (isTerminalWrapperState(currentState)) {
      if (latestFailure.summary.nonEmpty) {
        outcomeState = latestFailure.summary
        outcomeMessage = firstNonEmpty(latestFailure.message, currentMessage)
      } else if (latestSuccess.summary.nonEmpty) {
        outcomeState = latestSuccess.summary
        outcomeMessage = firstNonEmpty(latestSuccess.message, currentMessage)
      } else if (latestTerminal.summary.nonEmpty) {
        outcomeState = latestTerminal.summary
        outcomeMessage = firstNonEmpty(latestTerminal.message, currentMessage)
      }
    } else if (outcomeState.isEmpty) {
      if (latestTerminal.summary.nonEmpty) {
        outcomeState = latestTerminal.summary
        outcomeMessage = firstNonEmpty(latestTerminal.message, currentMessage)
      } else if (latestMeaningful.summary.nonEmpty) {
        outcomeState = latestMeaningful.summary
        outcomeMessage = firstNonEmpty(latestMeaningful.message, currentMessage)
      }
    } else if (outcomeMessage.isEmpty) {
      // normalized comparison like every other state check — a history
      // entry spelled "FAILED" must backfill an outcome of "Failed"
      outcomeMessage = normalize(outcomeState) match {
        case st if st == normalize(latestFailure.summary) => latestFailure.message
        case st if st == normalize(latestSuccess.summary) => latestSuccess.message
        case st if st == normalize(latestTerminal.summary) => latestTerminal.message
        case st if st == normalize(latestMeaningful.summary) => latestMeaningful.message
        case _ => outcomeMessage
      }
    }

    Resolved(
      currentState = currentState,
      outcomeState = firstNonEmpty(outcomeState, currentState),
      message = firstNonEmpty(outcomeMessage, currentMessage))
  }

  /** Meaningful transitions in order, for task-result recording
    * (go:391-412 TransitionResults). */
  def transitionResults(s: Status): Seq[Transition] =
    sortedTransitions(s.stateTransitionHistory)
      .filter(_.summary.nonEmpty)
      .map(t => Transition(t.summary, t.message, t.lastTransitionTime))

  /** Watch-event gate (service_maintenance_executor_spark.go:550-562):
    * only handle an update that is newly terminal, or whose terminal
    * state actually changed. */
  def shouldHandleUpdate(oldStatus: Status, newStatus: Status): Boolean = {
    val newResolved = resolve(newStatus)
    if (!newResolved.isTerminal) false
    else {
      val oldResolved = resolve(oldStatus)
      if (!oldResolved.isTerminal) true
      else normalize(oldResolved.state) != normalize(newResolved.state)
    }
  }
}
