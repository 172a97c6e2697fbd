package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Deck-provenance manifest round-trip (r16 VERDICT #5): every deck
  * consumer fails fast on a stale or hand-made deck instead of
  * producing a cryptic downstream error (the stale-/tmp-deck incident
  * one-classed the NB family and cost a full sweep). Pure file ops —
  * no Spark session.
  */
class ScaleFixtureSpec extends AnyFunSuite {

  private def tmpDeck(): String =
    Files.createTempDirectory("graft_deck_").toString

  test("manifest round-trip: a freshly written manifest verifies") {
    val d = tmpDeck()
    ScaleFixture.writeManifest(d, factor = 10, src = "/root/testdata/sf0.1")
    ScaleFixture.verifyManifest(d) // must not throw
    // and the written JSON carries the provenance fields
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(
        Paths.get(d, ScaleFixture.ManifestName)))
    assert(node.get("generator").asText() == "graft.ScaleFixture")
    assert(node.get("scheme_version").asInt() == ScaleFixture.SchemeVersion)
    assert(node.get("factor").asInt() == 10)
  }

  test("a deliberately stale deck is refused with the rebuild message") {
    val d = tmpDeck()
    Files.writeString(Paths.get(d, ScaleFixture.ManifestName),
      """{"generator":"graft.ScaleFixture","scheme_version":2,"factor":10}""")
    val e = intercept[IllegalArgumentException] {
      ScaleFixture.verifyManifest(d)
    }
    assert(e.getMessage.contains("stale deck"))
    assert(e.getMessage.contains("ScaleFixture"))
  }

  test("a manifest-less non-driver dir is refused; driver fixture dirs are exempt") {
    val d = tmpDeck()
    val e = intercept[IllegalArgumentException] {
      ScaleFixture.verifyManifest(d)
    }
    assert(e.getMessage.contains(ScaleFixture.ManifestName))
    // the driver's source fixtures are not decks and carry no manifest
    ScaleFixture.verifyManifest("/root/testdata/sf0.01") // must not throw
  }
}
