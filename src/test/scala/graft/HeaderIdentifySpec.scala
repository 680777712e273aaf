package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.HeaderIdentify

/** A6/A7/W2/W3/F16: header detection + flattening on reference-shaped
  * synthetic grids (2–3-level hierarchies with pandas-style gaps).
  * Key reference semantics pinned here: the DEEPEST detected header row
  * is excluded from both the flattening levels and the data area
  * (select_header_levels keeps indexes < max;
  * header_identify_processing.py:30-40), and flattening joins levels
  * deepest-first (the new path's [::-1], :88). */
class HeaderIdentifySpec extends AnyFunSuite {

  private val N = null.asInstanceOf[String]

  test("hierarchy flattens deepest-kept-level first and drops headerless columns") {
    val grid = Seq(
      Seq("Marca", "Emisiones", N, N),
      Seq(N, "CO2", "NOx", N),
      Seq(N, "g/km", "g/km", "extra"),
      Seq("row-sep", N, N, N),
      Seq("TOYOTA", "120", "0.05", "x"))
    // firstValid=[0,0,1,2] → valid max=2, clean levels=[0,1], maxrow=1
    val r = HeaderIdentify.identify(grid)
    assert(r.maxrow == 1)
    val names = r.names.toMap
    assert(names(0) == "Marca")
    assert(names(1) == "CO2 Emisiones") // deepest-first ([::-1]) order
    assert(names(2) == "NOx Emisiones") // parent ffill across columns
    assert(!names.contains(3)) // no header content at retained levels
  }

  test("parent forward-fill groups spanning columns") {
    val grid = Seq(
      Seq("A", N, "B", N, N),
      Seq("x", "y", "u", "v", N),
      Seq("d", "d", "d", "d", "deep"))
    val r = HeaderIdentify.identify(grid)
    assert(r.maxrow == 1)
    assert(r.names.toMap == Map(0 -> "x A", 1 -> "y A", 2 -> "u B", 3 -> "v B"))
  }

  test("three-level hierarchy forward-fills levels 1 and 2 within groups") {
    val grid = Seq(
      Seq("A", N, N, N),
      Seq("x", "y", N, N),
      Seq("m", N, "n", N),
      Seq(N, N, N, "deep"),
      Seq("d", "d", "d", "d"))
    // firstValid=[0,1,2,3] → clean levels=[0,1,2], maxrow=2
    val r = HeaderIdentify.identify(grid)
    assert(r.maxrow == 2)
    // within group A: level1 ffills x→y→y, level2 ffills m→m→n;
    // flattened deepest-first = "l2 l1 l0"
    assert(r.names.toMap == Map(0 -> "m x A", 1 -> "m y A", 2 -> "n y A"))
  }

  test("single header row degrades gracefully (reference would crash)") {
    val grid = Seq(
      Seq("h1", "h2"),
      Seq("a", "b"))
    val r = HeaderIdentify.identify(grid)
    assert(r.maxrow == 0)
    assert(r.names.toMap == Map(0 -> "h1", 1 -> "h2"))
  }

  test("Unnamed: placeholders are skipped in flattened names") {
    val grid = Seq(
      Seq("Unnamed: 0", "P", N, N),
      Seq("k1", "k2", "k3", N),
      Seq("d", "d", "d", "d"))
    val r = HeaderIdentify.identify(grid)
    val names = r.names.toMap
    assert(names(0) == "k1")     // parent cell is an Unnamed: filler
    assert(names(1) == "k2 P")
    assert(names(2) == "k3 P")   // parent inherited via ffill
  }
}
