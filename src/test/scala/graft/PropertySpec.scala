package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.catalog.Names
import graft.sql.SqlGuard

/** ScalaCheck properties (SURVEY.md §5.4): invariants that must hold
  * for arbitrary inputs, not just the unit-test corpus. Run natively
  * by sbt's ScalaCheck framework. */
object GuardProperties extends Properties("graft") {

  private val anyString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '-', '!', '_', 'é', 'д')))
      .map(_.mkString)

  property("normalizeSchemaName yields a valid identifier, idempotently") =
    forAll(anyString.suchThat(_.nonEmpty)) { s =>
      val n = Names.normalizeSchemaName(s)
      Prop.all(
        Prop(n.nonEmpty && n.length <= Names.MaxLength) :| "bounded",
        Prop(n.matches("[a-z_][a-z0-9_]*")) :| s"identifier: $n",
        Prop(!n.contains("__")) :| "no collapsed runs",
        Prop(Names.normalizeSchemaName(n) == n) :| "idempotent")
    }

  property("isSafe never passes a forbidden keyword") = {
    val keywords = Gen.oneOf("INSERT", "UPDATE", "DELETE", "CREATE", "DROP",
      "ALTER", "ATTACH", "COPY", "PRAGMA", "EXPORT", "IMPORT")
    forAll(anyString, keywords, anyString) { (pre, kw, post) =>
      !SqlGuard.isSafe(s"$pre $kw $post")._1
    }
  }

  property("overrideLimit leaves exactly one trailing LIMIT") = {
    val base = Gen.oneOf("SELECT * FROM t", "SELECT a, b FROM t ORDER BY a",
      "SELECT * FROM t LIMIT 200", "SELECT * FROM t LIMIT 5;")
    forAll(base, Gen.choose(1, 10000)) { (sql, n) =>
      val out = SqlGuard.overrideLimit(sql, n)
      out.matches(s"(?is).*\\bLIMIT $n\\s*$$") &&
        "(?i)LIMIT".r.findAllIn(out).size == 1
    }
  }
}
