package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SourceCatalog._

/** Control-plane analog (C1-C6, subscriber.js semantics). */
class SourceCatalogSpec extends AnyFunSuite {
  private def cfg = CatalogConfig(prefix = "/aws/lambda/",
    filterName = "graft-filter", shipperFunctionName = "shipper")

  test("C1: paginated scan accumulates all pages (page size 50)") {
    val groups = (1 to 173).map(i => f"/aws/lambda/fn-$i%03d") :+ "/other/x"
    val api = new InMemoryLogGroupApi(groups)
    val listed = listLogGroups(api, cfg)
    assert(listed.size == 173)           // prefix filter applied
    assert(listed == listed.sorted)
  }

  test("C2: shipper's own group is skipped (cycle guard)") {
    val api = new InMemoryLogGroupApi(Seq("/aws/lambda/a", "/aws/lambda/shipper"))
    val out = processAll(api, cfg)
    assert(out("/aws/lambda/shipper") == "skipped_self")
    assert(!api.filters.contains("/aws/lambda/shipper"))
    assert(api.filters.contains("/aws/lambda/a"))
  }

  test("C3: idempotent upsert — rerun unchanged, differing filter replaced") {
    val api = new InMemoryLogGroupApi(Seq("/aws/lambda/a"))
    assert(processAll(api, cfg)("/aws/lambda/a") == "subscribed")
    // second run: filter exists and matches -> unchanged, no delete/re-put
    assert(processAll(api, cfg)("/aws/lambda/a") == "unchanged")
    // differing filter name -> delete + re-put
    val cfg2 = cfg.copy(filterName = "graft-filter-v2")
    assert(processAll(api, cfg2)("/aws/lambda/a") == "upserted")
    assert(api.filters("/aws/lambda/a").filterName == "graft-filter-v2")
  }

  test("C4: retention applied to every subscribed group") {
    val api = new InMemoryLogGroupApi(Seq("/aws/lambda/a", "/aws/lambda/b"))
    processAll(api, cfg)
    assert(api.retention.toMap == Map("/aws/lambda/a" -> 1, "/aws/lambda/b" -> 1))
  }
}
