package graft.util

/** Per-key once-only memoization for shared DataFrame artifacts.
  *
  * The earlier whole-map `synchronized { getOrElseUpdate }` pattern
  * held one global lock across the build+persist+count of the value —
  * correct, but it serializes the materialization of INDEPENDENT
  * artifacts, which defeats concurrent prepare phases (two marts that
  * could overlap their Spark jobs on the same cores built one after
  * the other). This keeps the once-only guarantee per key while
  * letting different keys materialize in parallel: losers of the
  * `putIfAbsent` race discard their (unevaluated) cell and block only
  * on the winner's lazy val.
  */
/** @param stale keys for which the cached value is dead and must be
  *   dropped — e.g. the key's SparkSession has been stopped, so its
  *   cached blocks are gone and the entry would otherwise strongly
  *   reference the session object forever in a long-lived
  *   multi-session process. Checked on every getOrBuild (the maps
  *   hold a handful of artifacts; the sweep is cheap). */
final class Memo[K, V](stale: K => Boolean = (_: K) => false) {
  private final class Cell(thunk: () => V) { lazy val value: V = thunk() }
  private val cells = collection.concurrent.TrieMap.empty[K, Cell]

  /** Get the memoized value for `key`, building it with `build` if
    * absent. `build` runs at most once per key across all threads. */
  def getOrBuild(key: K, build: => V): V = {
    cells.keys.filter(stale).foreach(cells.remove)
    val mine = new Cell(() => build)
    cells.putIfAbsent(key, mine).getOrElse(mine).value
  }
}
