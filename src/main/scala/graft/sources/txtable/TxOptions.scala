package graft.sources.txtable

/**
 * The ONE case-insensitive option parser behind every txtable surface
 * (round 20, folding the five hand-rolled lowercase-map idioms the
 * round-19 review flagged): batch read ([[TxTableSource.rootAndAsOf]]),
 * writer layout ([[TxTableSource.layoutOf]]), batch feed
 * ([[TxTableSource.feedParams]]), streaming source
 * ([[TxFeedSource.streamParams]]), streaming sink
 * ([[TxStreamSink.sinkParams]]). DataSource options are case-insensitive
 * by Spark convention (`CaseInsensitiveStringMap` on the V2 path), and
 * the V1 fallback paths hand plain maps — this normalizes both.
 */
private[txtable] final class TxOptions(opts: Map[String, String]) {
  private val lower = opts.map { case (k, v) =>
    k.toLowerCase(java.util.Locale.ROOT) -> v }

  def get(k: String): Option[String] =
    lower.get(k.toLowerCase(java.util.Locale.ROOT))

  def contains(k: String): Boolean =
    lower.contains(k.toLowerCase(java.util.Locale.ROOT))

  /** Required option, failing with the surface's own usage message. */
  def required(k: String, msg: => String): String =
    get(k).getOrElse(throw new IllegalArgumentException(msg))

  /** Comma-split column list; absent → empty. */
  def cols(k: String): Seq[String] =
    get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  def bool(k: String): Boolean = get(k).exists(_.toBoolean)

  def long(k: String): Option[Long] = get(k).map(_.trim.toLong)
}

private[txtable] object TxOptions {
  def apply(opts: Map[String, String]): TxOptions = new TxOptions(opts)
}
