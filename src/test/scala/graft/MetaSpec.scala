package graft

import org.scalatest.funsuite.AnyFunSuite

/** The provenance helper's parsing rules (r18 advisor: the porcelain
  * path handling was copy-pasted four times and had already drifted;
  * rename lines and quoted paths landed as one odd string). */
class MetaSpec extends AnyFunSuite {
  test("porcelain path: plain, trim-eaten first line, rename, C-quoted") {
    assert(Meta.porcelainPath(" M src/a.scala") == "src/a.scala")
    // git()'s .trim eats the FIRST line's leading status space — the
    // parse must not care whether the column survived
    assert(Meta.porcelainPath("M src/a.scala") == "src/a.scala")
    // rename lines record the NEW path (the tree content)
    assert(Meta.porcelainPath("R  docs/old.md -> docs/new.md") == "docs/new.md")
    // paths with specials arrive C-quoted
    assert(Meta.porcelainPath(""" M "a b.txt"""") == "a b.txt")
  }

  test("metaJson parses as JSON with sha/tree/utc; round only when asked") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Meta.metaJson())
    assert(node.get("git_sha").asText().nonEmpty)
    assert(Set("clean", "dirty", "unknown")(node.get("tree").asText()))
    java.time.Instant.parse(node.get("utc").asText()) // must parse
    assert(node.get("round") == null)
    val withRound = om.readTree(Meta.metaJson(includeRound = true))
    assert(withRound.has("round")) // null or the env tag, but present
  }
}
