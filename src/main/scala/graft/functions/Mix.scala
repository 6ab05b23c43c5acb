package graft.functions

/** THE one definition of the splitmix64 avalanche finalizer (public
  * domain, Steele et al.) shared by the hash/sketch families:
  * [[HllSketch]] applies it after the golden-ratio stream increment
  * (full splitmix64), [[graft.operators.NearDup]] uses the bare
  * finalizer for shingle/band mixing. Both families' determinism
  * claims ("stable across JVMs, executors and runs") rest on this
  * exact bit pattern — any change must re-pin every no-oracle spec.
  */
object Mix {
  def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
