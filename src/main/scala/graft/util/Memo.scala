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
final class Memo[K, V] {
  private final class Cell(thunk: () => V) { lazy val value: V = thunk() }
  private val cells = collection.concurrent.TrieMap.empty[K, Cell]

  /** Get the memoized value for `key`, building it with `build` if
    * absent. `build` runs at most once per key across all threads. */
  def getOrBuild(key: K, build: => V): V = {
    val mine = new Cell(() => build)
    cells.putIfAbsent(key, mine).getOrElse(mine).value
  }
}
