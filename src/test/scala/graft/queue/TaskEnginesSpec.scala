package graft.queue

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.Model.TaskKind

/** Task-kind → engine resolution (reference task_engines.go:19-63). */
class TaskEnginesSpec extends AnyFunSuite {

  test("default maps every kind to spark and resolves all known kinds") {
    val r = TaskEngines.default
    TaskKind.all.foreach { kind =>
      assert(r.resolve(kind) == Right(TaskEngines.Spark))
    }
  }

  test("custom map is honored per kind (reference's shipped split)") {
    val r = TaskEngines.of(
      expireSnapshots = TaskEngines.Trino,
      removeOrphanFiles = TaskEngines.Trino,
      optimize = TaskEngines.Spark).toOption.get
    assert(r.resolve(TaskKind.ExpireSnapshots) == Right("trino"))
    assert(r.resolve(TaskKind.RemoveOrphanFiles) == Right("trino"))
    assert(r.resolve(TaskKind.Optimize) == Right("spark"))
  }

  test("invalid engine is rejected at construction (task_engines.go:55-63)") {
    val err = TaskEngines.of(optimize = "presto").swap.toOption.get
    assert(err.contains("invalid engine"))
    assert(err.contains("presto"))
    assert(err.contains(TaskKind.Optimize))
  }

  test("unknown kind is rejected at resolve time (task_engines.go:46-53)") {
    assert(TaskEngines.default.resolve("vacuum") == Left("unknown task kind vacuum"))
    intercept[IllegalArgumentException](TaskEngines.default.resolveOrThrow("vacuum"))
  }
}
