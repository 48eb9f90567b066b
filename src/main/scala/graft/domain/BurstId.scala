package graft.domain

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentinel-1 burst-ID physics (SURVEY.md D9, parse_bursts.py:58-160 —
  * itself implementing the public ESA "Sentinel-1 Level 1 Detailed Algorithm
  * Definition" Eq. 9-89/9-91 with Table 9-7 constants).
  *
  * Two forms:
  *   - a pure Scala function for ingest-side flatMap/mapPartitions;
  *   - Column arithmetic (`esaBurstIdCol`) for the simple no-equator-crossing
  *     case — codegen'd, usable straight in a scan projection.
  */
object BurstId {

  val TBeam = 2.758273 // one burst interval [s] (Table 9-7)
  val TPre = 2.299849 // preamble [s]
  val TOrb: Double = 12 * 86400.0 / 175.0 // nominal orbit period [s]

  /** IW1→IW2, IW2→IW3, IW3→IW1 burst-to-burst times [s]. */
  private val burstTimes = Array(0.832, 1.078, 0.848)

  final case class S1BurstId(track: Int, esaBurstId: Long, subswath: String) {
    def jplId: String = f"t$track%03d_${esaBurstId}%06d_${subswath.toLowerCase}"
  }

  /** Eq. 9-89/9-91 incl. equator-crossing track adjustment
    * (parse_bursts.py:110-160 semantics). */
  def fromBurstParams(sensingTime: Instant, ascendingNodeTime: Instant,
      startTrack: Int, endTrack: Int, subswath: String): S1BurstId = {
    val swathNum = subswath.last.asDigit
    val offset = swathNum match {
      case 1 => 0.0
      case 2 => -burstTimes(0)
      case 3 => -burstTimes(0) - burstTimes(1)
      case other => throw new IllegalArgumentException(s"bad subswath $subswath")
    }
    val startIw1 = secondsBetween(ascendingNodeTime, sensingTime) + offset
    val midIw2 = startIw1 + burstTimes(0) + burstTimes(1) / 2

    val hasAnxCrossing = endTrack == startTrack + 1 || (endTrack == 1 && startTrack == 175)
    var timeSinceAnx = midIw2
    val track =
      if (startIw1 - TOrb < 0) startTrack
      else {
        if (!hasAnxCrossing) timeSinceAnx -= TOrb
        endTrack
      }
    val dtB = timeSinceAnx + (startTrack - 1) * TOrb
    val esaId = 1L + math.floor((dtB - TPre) / TBeam).toLong
    S1BurstId(track, esaId, subswath)
  }

  private def secondsBetween(a: Instant, b: Instant): Double =
    (b.getEpochSecond - a.getEpochSecond) + (b.getNano - a.getNano) / 1e9

  /** Column form of Eq. 9-89/9-91 for the common single-track case:
    * timestamps in microseconds, pure arithmetic (codegen'd). */
  def esaBurstIdCol(sensingUs: Column, anxUs: Column, track: Column): Column = {
    val dtB = (sensingUs - anxUs).cast("double") / 1e6 +
      (track - 1).cast("double") * TOrb
    (floor((dtB - TPre) / TBeam) + 1).cast("long")
  }
}
