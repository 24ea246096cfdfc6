package graft.sql

import org.apache.spark.sql.SparkSession

/** Session-scoped sequences — DuckDB's `CREATE SEQUENCE` / `nextval` /
  * `currval` surface (reference host engine; semantics pinned on 1.0:
  * START/INCREMENT options, duplicate-create and missing-sequence
  * Catalog Errors, currval-before-nextval Sequence Error, CREATE OR
  * REPLACE resets state).
  *
  * Scale contract, stated not hidden: a sequence is a single atomic
  * counter — inherently serialized state, exactly as single-node DuckDB
  * runs it. Counters live in this JVM keyed by session; driver-side
  * evaluation (constant select lists, small local relations — the shapes
  * scripts use sequences for) is exact. A `nextval` inside a distributed
  * scan serializes every row through one counter — DuckDB pays the same
  * cost on its single node, but at cluster scale the right tool is
  * `monotonically_increasing_id()`/`uuid()`, which the missing-sequence
  * error text points at. Values are unique and strictly advancing, never
  * gap-free under retries (same as any sequence under task retry).
  */
object Sequences {

  private final class State(val increment: Long, start: Long) {
    private val next = new java.util.concurrent.atomic.AtomicLong(start)
    @volatile var defined = false
    @volatile var current: Long = start
    def nextval(): Long = {
      val v = next.getAndAdd(increment)
      current = v
      defined = true
      v
    }
  }

  private val registry = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), State]()

  private def key(name: String): (SparkSession, String) =
    (SparkSession.active, name.toLowerCase)

  def create(name: String, start: Long = 1L, increment: Long = 1L,
      orReplace: Boolean = false, ifNotExists: Boolean = false): Unit = {
    val k = key(name)
    if (registry.containsKey(k) && !orReplace) {
      if (ifNotExists) return
      throw new IllegalStateException(
        s"""Catalog Error: Sequence with name "$name" already exists!""")
    }
    registry.put(k, new State(increment, start))
    ()
  }

  def drop(name: String, ifExists: Boolean = false): Unit = {
    if (registry.remove(key(name)) == null && !ifExists)
      throw new IllegalStateException(
        s"Catalog Error: Sequence with name $name does not exist!")
  }

  private def lookup(name: String): State = {
    val s = registry.get(key(name))
    if (s == null)
      throw new IllegalStateException(
        s"Catalog Error: Sequence with name $name does not exist! " +
          "(for distributed unique ids use monotonically_increasing_id() " +
          "or uuid() instead of a serialized sequence)")
    s
  }

  def nextval(name: String): Long = lookup(name).nextval()

  def currval(name: String): Long = {
    val s = lookup(name)
    if (!s.defined)
      throw new IllegalStateException(
        "Sequence Error: currval: sequence is not yet defined in this session")
    s.current
  }
}
