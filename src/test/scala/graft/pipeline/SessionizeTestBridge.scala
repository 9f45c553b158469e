package graft.pipeline

/** Test access to the package-private incremental session merge. */
object SessionizeTestBridge {
  def merge(sessions: List[Sessionize.SessionSummary], tsUs: Long, value: Double,
            gapUs: Long): List[Sessionize.SessionSummary] =
    Sessionize.mergeEvent(sessions, tsUs, value, gapUs)
}
