package graft

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.PiiScanOps
import graft.operators.PiiOps

/** The anchored linear PII kernels must be BIT-EQUAL to the
  * java.util.regex reference they replaced (which is itself the
  * certified cross-engine contract — the x66 oracle interpolates the
  * same pattern strings into DuckDB). Fuzz over an alphabet dense in
  * the patterns' special characters, plus the known hard cases.
  */
class PiiScanSpec extends AnyFunSuite {

  private val email = Pattern.compile(PiiOps.EmailPattern)
  private val ipv4 = Pattern.compile(PiiOps.Ipv4Pattern)

  private def refEmail(s: String) =
    PiiScanOps.replaceCount(s, email, PiiOps.EmailToken, guarded = false)
  private def refIpv4(s: String) =
    PiiScanOps.replaceCount(s, ipv4, PiiOps.Ipv4Token, guarded = true)

  private def checkBoth(s: String): Unit = {
    assert(PiiScanOps.emailReplaceCount(s, PiiOps.EmailToken) === refEmail(s),
      s"email diverged on <$s>")
    assert(PiiScanOps.ipv4ReplaceCount(s, PiiOps.Ipv4Token) === refIpv4(s),
      s"ipv4 diverged on <$s>")
    // the two-pass IPv4 rule composes identically
    val h1 = PiiScanOps.ipv4ReplaceCount(
      PiiScanOps.ipv4ReplaceCount(s, PiiOps.Ipv4Token)._1, PiiOps.Ipv4Token)
    val r1 = refIpv4(refIpv4(s)._1)
    assert(h1 === r1, s"ipv4 second pass diverged on <$s>")
  }

  test("hard cases: every certified boundary shape") {
    Seq(
      "", "@", "a@", "@b.cc", "a@b.cc", "x a@b.cc y",
      "a@b.cc@d.ee", "a@@b.cc", "a@b..cc", "a@b.c", "a@b.cde.fgh",
      ("l" * 70) + "@x.dd", ("l" * 64) + "@x.dd", "a@" + ("d" * 260) + ".cc",
      "a@b." + ("t" * 30), "m5@ex.org px +5 10-20 m6@ex.org",
      "a@b-c.dd", "a@-b.cc", "a.b.c@d.ee", "%+-._@x.yy",
      "1.2.3.4", " 1.2.3.4 ", "x1.2.3.4", "1.2.3.4x", "1.2.3.45x",
      "1234.5.6.7", "1.2.3.4567", "1.2.3.4.5", "1.2.3.4.", "1.2.3.4.x",
      "9.9.9.9 8.8.8.8", "ver 1.2.3.4.5", "ip 10.0.0.1.", "1.2.3.4$",
      "a_1.2.3.4", "(1.2.3.4)", "..1.2.3.4..", "1.2.3.4 5.6.7.8 9.9.9.9",
      "0.0.0.0$1.2.3.4", "1.2.3.4@5.6.7.8", "email@1.2.3.4",
      "a@b.cc 1.2.3.4 tel +12345678901").foreach(checkBoth)
  }

  test("fuzz: dense special-character alphabet, 200k strings") {
    val alphabet = "azA190.@+-_%$()!#\n\t" + " "
    val rnd = new scala.util.Random(20260814)
    (0 until 200000).foreach { _ =>
      val n = rnd.nextInt(60)
      val s = new String(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
      checkBoth(s)
    }
  }

  test("fuzz: realistic fragments glued together") {
    val frags = Array("john.doe", "@example", ".com", ".c", "..", "@@",
      "192.168.0.1", "1.2.3", ".4.5", "999.999.999.999", "0.0.0.0",
      " ", "x", "-", "+", "_", "%20", "v1.2.3.4", "tel:", "a@b.cc",
      ("x" * 63), ("d" * 250), "ip ", ".pdf", "$", "\n")
    val rnd = new scala.util.Random(42)
    (0 until 50000).foreach { _ =>
      val s = (0 until 1 + rnd.nextInt(6))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString
      checkBoth(s)
    }
  }

  test("the full scan emits identical structs to the regex composition") {
    val rnd = new scala.util.Random(7)
    val alphabet = "a1.@+- _%$("
    (0 until 20000).foreach { _ =>
      val n = rnd.nextInt(80)
      val s = new String(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
      val (t1, nE) = refEmail(s)
      val (t1b, n1) = refIpv4(t1)
      val (t2, n2) = refIpv4(t1b)
      val phone = Pattern.compile(PiiOps.PhonePattern)
      val (t3, nP) = PiiScanOps.replaceCount(t2, phone, PiiOps.PhoneToken,
        guarded = false)
      val row = PiiScanOps.scan(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(row.getUTF8String(0).toString === t3, s"text diverged on <$s>")
      assert(row.getInt(1) === nE && row.getInt(2) === n1 + n2 &&
        row.getInt(3) === nP, s"counts diverged on <$s>")
    }
  }
}
