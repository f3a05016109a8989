package graft.tools

/** Standalone [[Calibration]] run — one JSON line with the anchor pair
  * and `weather_factor`, for pinning the reference constants and for
  * ad-hoc "is this window quiet?" checks between bench passes.
  */
object CalibrationProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val before = Calibration.sample()
    val after = Calibration.sample()
    println(s"{${Calibration.json(before, after)}}")
  }
}
