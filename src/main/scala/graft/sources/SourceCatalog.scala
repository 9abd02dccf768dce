package graft.sources

import scala.collection.concurrent.TrieMap
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.DurationInt

/** Control-plane analog of the reference subscriber (subscriber.js, C1-C6):
  * a source registry that discovers log groups page by page, subscribes each
  * to the shipping stream idempotently, skips the shipper's own group, and
  * applies a retention policy.
  *
  * Driver-side by design (like the reference: catalog management is an API
  * control loop, not a distributed dataflow). The [[LogGroupApi]] seam is
  * where a real CloudWatch/Glue/HMS client plugs in; tests use the in-memory
  * implementation with failure injection.
  */
object SourceCatalog {

  case class SubscriptionFilter(filterName: String, filterPattern: String,
                                destinationArn: String,
                                distribution: String = "ByLogStream")

  case class CatalogConfig(
      prefix: String,
      filterName: String,
      filterPattern: String = "", // subscriber.js:10 — match-all
      destinationArn: String = "stream:graft",
      retentionDays: Int = 1,     // sample.secrets.json:6
      shipperFunctionName: String = "shipper",
      pageSize: Int = 50)         // subscriber.js:20

  /** The external catalog service surface (CloudWatch Logs API shape). */
  trait LogGroupApi {
    /** Paged listing; returns (page, nextToken). */
    def describeLogGroups(prefix: String, limit: Int,
                          nextToken: Option[String]): (Seq[String], Option[String])
    /** Fails (Left) if a subscription filter already exists on the group. */
    def putSubscriptionFilter(group: String,
                              filter: SubscriptionFilter): Either[String, Unit]
    def describeSubscriptionFilters(group: String): Seq[SubscriptionFilter]
    def deleteSubscriptionFilter(group: String, filterName: String): Unit
    def putRetentionPolicy(group: String, days: Int): Unit
  }

  /** C1: full paginated scan (subscriber.js:18-32) — accumulate pages until
    * the token runs out. Tail-recursive accumulator like the reference.
    */
  @annotation.tailrec
  def listLogGroups(api: LogGroupApi, cfg: CatalogConfig,
                    acc: Seq[String] = Seq.empty,
                    nextToken: Option[String] = None): Seq[String] = {
    val (page, token) = api.describeLogGroups(cfg.prefix, cfg.pageSize, nextToken)
    val newAcc = acc ++ page
    token match {
      case Some(_) => listLogGroups(api, cfg, newAcc, token)
      case None => newAcc
    }
  }

  /** C3: idempotent subscribe — put; on conflict, read the existing filter
    * and delete+re-put only if name/pattern differ (subscriber.js:34-46).
    * Returns what happened (for tests/observability).
    */
  def subscribe(api: LogGroupApi, cfg: CatalogConfig,
                group: String): String = {
    val desired = SubscriptionFilter(cfg.filterName, cfg.filterPattern,
      cfg.destinationArn)
    api.putSubscriptionFilter(group, desired) match {
      case Right(_) => "subscribed"
      case Left(_) =>
        val existing = api.describeSubscriptionFilters(group).head
        if (existing.filterName != desired.filterName ||
          existing.filterPattern != desired.filterPattern) {
          api.deleteSubscriptionFilter(group, existing.filterName)
          api.putSubscriptionFilter(group, desired)
          "upserted"
        } else "unchanged"
    }
  }

  /** C2+C4+C5: concurrent subscribe-all with cycle-guard self-exclusion
    * (subscriber.js:67-82 — Promise.all ≙ Future.sequence fan-out).
    */
  def subscribeAll(api: LogGroupApi, cfg: CatalogConfig,
                   groups: Seq[String]): Map[String, String] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val work = groups.map { group =>
      Future {
        if (group.endsWith(cfg.shipperFunctionName)) group -> "skipped_self"
        else {
          val outcome = subscribe(api, cfg, group)
          api.putRetentionPolicy(group, cfg.retentionDays)
          group -> outcome
        }
      }
    }
    Await.result(Future.sequence(work), 5.minutes).toMap
  }

  /** C6: full sync (subscriber.js:84-87); idempotent — safe to run from
    * both the manual trigger and every new-source event.
    */
  def processAll(api: LogGroupApi, cfg: CatalogConfig): Map[String, String] =
    subscribeAll(api, cfg, listLogGroups(api, cfg))

  /** In-memory catalog service with the CloudWatch behaviors the reference
    * relies on: put fails when a filter exists; listing pages.
    */
  class InMemoryLogGroupApi(groups: Seq[String]) extends LogGroupApi {
    val filters = new TrieMap[String, SubscriptionFilter]
    val retention = new TrieMap[String, Int]

    override def describeLogGroups(prefix: String, limit: Int,
        nextToken: Option[String]): (Seq[String], Option[String]) = {
      val all = groups.filter(_.startsWith(prefix)).sorted
      val start = nextToken.map(_.toInt).getOrElse(0)
      val page = all.slice(start, start + limit)
      val next = if (start + limit < all.size) Some((start + limit).toString) else None
      (page, next)
    }

    override def putSubscriptionFilter(group: String,
        filter: SubscriptionFilter): Either[String, Unit] =
      if (filters.contains(group)) Left(s"LimitExceeded: filter exists on $group")
      else { filters.put(group, filter); Right(()) }

    override def describeSubscriptionFilters(group: String): Seq[SubscriptionFilter] =
      filters.get(group).toSeq

    override def deleteSubscriptionFilter(group: String, filterName: String): Unit =
      filters.remove(group)

    override def putRetentionPolicy(group: String, days: Int): Unit =
      retention.put(group, days)
  }
}
