package graft.core

/** Frontier row status codes.
  *
  * Values match the reference byte codes (reference:
  * src/java/org/apache/nutch/crawl/CrawlStatus.java:24-36) so fixture dumps
  * are directly comparable.
  */
object CrawlStatus {
  val Unfetched: Int = 0x01
  val Fetched: Int = 0x02
  val Gone: Int = 0x03
  val RedirTemp: Int = 0x04
  val RedirPerm: Int = 0x05
  val Retry: Int = 0x22
  val NotModified: Int = 0x26

  def name(s: Int): String = s match {
    case Unfetched => "UNFETCHED"
    case Fetched => "FETCHED"
    case Gone => "GONE"
    case RedirTemp => "REDIR_TEMP"
    case RedirPerm => "REDIR_PERM"
    case Retry => "RETRY"
    case NotModified => "NOTMODIFIED"
    case other => s"UNKNOWN($other)"
  }
}

/** Outcome of one fetch attempt, as seen by the updatedb merge. */
object FetchOutcome {
  val Success: Int = 1
  val NotModified: Int = 2
  val RetryTransient: Int = 3
  val Gone: Int = 4
  val RedirTemp: Int = 5
  val RedirPerm: Int = 6
}
