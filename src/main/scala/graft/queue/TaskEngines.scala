package graft.queue

import graft.meta.Model.TaskKind

/** Task-kind → execution-engine resolution (reference
  * task_engines.go:19-63): each maintenance task kind is dispatched to a
  * configured engine, validated at construction, unknown kinds rejected
  * at resolve time.
  *
  * The reference ships trino for expire/remove_orphan_files and spark
  * for optimize (task_engines.go:21-25, config.dist.yml:58-61); this
  * single-JVM rebuild executes every kind as a Spark job in-process, so
  * the shipped default maps every kind to "spark" — the resolver exists
  * so a deployment that fans procedures out to an external SQL engine
  * can re-point kinds without touching enqueue sites, exactly like the
  * reference's `tasks.engines` config block.
  */
final class TaskEngines private (private val engines: Map[String, String]) {

  /** Resolve(kind) — unknown kind is an error (task_engines.go:46-53). */
  def resolve(kind: String): Either[String, String] =
    engines.get(kind).toRight(s"unknown task kind $kind")

  /** Resolve a kind that is statically known to be registered. */
  def resolveOrThrow(kind: String): String =
    resolve(kind).fold(e => throw new IllegalArgumentException(e), identity)
}

object TaskEngines {
  val Spark = "spark"
  val Trino = "trino"
  private val ValidEngines = Set(Spark, Trino)

  /** The single-engine deployment default: everything on Spark. */
  val default: TaskEngines = new TaskEngines(Map(
    TaskKind.ExpireSnapshots -> Spark,
    TaskKind.RemoveOrphanFiles -> Spark,
    TaskKind.Optimize -> Spark))

  /** Build from per-kind config with validation
    * (task_engines.go:27-43,55-63). */
  def of(expireSnapshots: String = Spark, removeOrphanFiles: String = Spark,
      optimize: String = Spark): Either[String, TaskEngines] = {
    val m = Map(
      TaskKind.ExpireSnapshots -> expireSnapshots,
      TaskKind.RemoveOrphanFiles -> removeOrphanFiles,
      TaskKind.Optimize -> optimize)
    m.toSeq.sortBy(_._1).collectFirst {
      case (kind, engine) if !ValidEngines(engine) =>
        s"""invalid engine "$engine" configured for task kind $kind"""
    }.toLeft(new TaskEngines(m))
  }
}
