package graft.examples

/** Re-measures the quiet-box reference for [[graft.Bench.calibrate]]: prints
  * five back-to-back probe timings and their median. Run on a quiet box
  * (check /proc/stat steal ~0 and no concurrent sbt/spark JVMs) and update
  * `Bench.CalibQuietS` if the hardware or JVM changes the median by >10%.
  *
  *   tools/run.sh graft.examples.CalibProbe
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val times = (1 to n).map { i =>
      val t = graft.Bench.calibrate()
      println(f"calib[$i] = $t%.4f s")
      t
    }
    val sorted = times.sorted
    println(f"median = ${sorted(sorted.size / 2)}%.4f s")
  }
}
