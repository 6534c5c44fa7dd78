package graft.queue

import org.scalatest.funsuite.AnyFunSuite

import AppStatus._

/** App-status state machine semantics, mirrored from
  * spark_application_template.go:267-412 and
  * service_maintenance_executor_spark.go:550-601. */
class AppStatusSpec extends AnyFunSuite {

  private def st(state: String, msg: String = "", summary: String = "", at: String = "") =
    AppState(state = state, currentStateSummary = summary, message = msg,
      lastTransitionTime = at)

  test("state classification: success, failure, wrapper, case/space-insensitive") {
    assert(isSuccessState("COMPLETED") && isSuccessState(" succeeded "))
    assert(isFailureState("FAILED") && isFailureState("submission_failed") &&
      isFailureState("SubmissionFailed") && isFailureState("FAILING"))
    assert(isTerminalWrapperState("ResourceReleased") &&
      isTerminalWrapperState("TERMINATEDWITHOUTRELEASERESOURCES"))
    assert(isTerminalState("COMPLETED") && isTerminalState("FAILED") &&
      isTerminalState("ResourceReleased"))
    assert(!isTerminalState("RUNNING") && !isSuccessState("FAILED"))
  }

  test("sortedTransitions: numeric keys ascending before lexicographic keys") {
    val h = Map(
      "10" -> st("J"), "2" -> st("B"), "zz" -> st("Z"),
      "1" -> st("A"), "aa" -> st("Y"))
    assert(sortedTransitions(h).map(_.state) == Seq("A", "B", "J", "Y", "Z"))
  }

  test("summary prefers the operator summary over the raw state") {
    assert(st("RUNNING", summary = "FAILING").summary == "FAILING")
    assert(st("RUNNING").summary == "RUNNING")
  }

  test("wrapper current state resolves to the latest failure over later success") {
    val s = Status(
      currentState = st("ResourceReleased", msg = "released"),
      stateTransitionHistory = Map(
        "1" -> st("RUNNING"),
        "2" -> st("FAILED", msg = "oom"),
        "3" -> st("COMPLETED", msg = "done")))
    val r = resolve(s)
    assert(r.currentState == "ResourceReleased")
    assert(r.outcomeState == "FAILED")
    assert(r.message == "oom")
    assert(r.isTerminal && !r.isSuccess)
  }

  test("wrapper current state falls back to success, then plain terminal") {
    val success = Status(
      currentState = st("ResourceReleased"),
      stateTransitionHistory = Map("1" -> st("COMPLETED", msg = "ok")))
    assert(resolve(success).outcomeState == "COMPLETED")
    assert(resolve(success).isSuccess)
    // No failure/success in history: any non-wrapper terminal wins —
    // wrapper transitions themselves are skipped as outcomes.
    val wrapperOnly = Status(
      currentState = st("ResourceReleased", msg = "released"),
      stateTransitionHistory = Map("1" -> st("RUNNING"),
        "2" -> st("ResourceReleased")))
    val r = resolve(wrapperOnly)
    assert(r.outcomeState == "ResourceReleased") // nothing better known
    assert(r.message == "released")
  }

  test("empty current state falls back to latest terminal, else latest meaningful") {
    val terminal = Status(stateTransitionHistory = Map(
      "1" -> st("RUNNING", msg = "go"),
      "2" -> st("FAILED", msg = "boom")))
    val rt = resolve(terminal)
    assert(rt.currentState == "" && rt.outcomeState == "FAILED" && rt.message == "boom")
    val running = Status(stateTransitionHistory = Map(
      "1" -> st("SUBMITTED"), "2" -> st("RUNNING", msg = "go")))
    val rr = resolve(running)
    assert(rr.outcomeState == "RUNNING" && rr.message == "go" && !rr.isTerminal)
  }

  test("missing message backfills from the transition that supplied the outcome") {
    val s = Status(
      currentState = st("FAILED"), // no message on the live state
      stateTransitionHistory = Map("1" -> st("FAILED", msg = "exit code 137")))
    assert(resolve(s).message == "exit code 137")
  }

  test("applicationState is the fallback when currentState is blank (firstNonEmpty)") {
    val s = Status(
      applicationState = st("COMPLETED", msg = ""),
      errorMessage = "err-field")
    val r = resolve(s)
    assert(r.currentState == "COMPLETED" && r.message == "err-field")
  }

  test("transitionResults keeps only meaningful transitions, in order") {
    val s = Status(stateTransitionHistory = Map(
      "1" -> st("SUBMITTED", at = "t1"),
      "2" -> st("", msg = "noise"),
      "3" -> st("RUNNING", msg = "go", at = "t3")))
    assert(transitionResults(s) == Seq(
      Transition("SUBMITTED", "", "t1"), Transition("RUNNING", "go", "t3")))
  }

  test("shouldHandleUpdate: newly-terminal fires once, repeat terminal is idempotent") {
    val running = Status(currentState = st("RUNNING"))
    val failed = Status(currentState = st("FAILED"))
    val completed = Status(currentState = st("COMPLETED"))
    assert(!shouldHandleUpdate(running, running))      // not terminal yet
    assert(shouldHandleUpdate(running, failed))        // newly terminal
    assert(!shouldHandleUpdate(failed, failed))        // same terminal state
    assert(shouldHandleUpdate(failed, completed))      // terminal state changed
    // Case-normalized comparison: FAILED == failed.
    val failedLower = Status(currentState = st("failed"))
    assert(!shouldHandleUpdate(failed, failedLower))
  }
}
