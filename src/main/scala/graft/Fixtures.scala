package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

/**
 * Per-JVM memoization of on-disk query fixtures (temp-dir datasets, multi-
 * commit chains, servers). Several [[SparkEntry.queries]] entries must build
 * a real dataset before they can query it; building is NOT the operator
 * under test, so Bench should time it at most once (the min-of-N policy then
 * reports pure query time) and Verify semantics are unchanged — the build
 * closure runs exactly once per (entry, sf-dir) key per JVM.
 *
 * Keys must include every input the build depends on (normally the sf dir),
 * and the build must leave the fixture immutable afterwards: callers re-open
 * the returned paths read-only.
 */
object Fixtures {
  private val cache = new ConcurrentHashMap[String, AnyRef]()

  def cached[T <: AnyRef](key: String)(build: => T): T =
    cache
      .computeIfAbsent(key, new JFunction[String, AnyRef] { def apply(k: String): AnyRef = build })
      .asInstanceOf[T]
}
