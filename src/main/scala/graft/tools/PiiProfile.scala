package graft.tools

import java.util.regex.Pattern

import graft.operators.PiiOps

/** Driver-side micro-profile of the x66 pii_scan kernel: times each
  * category pass separately over the probe's own augmented payloads,
  * so the "16× the DuckDB mirror" gap decomposes into named stages
  * (which regex, or the md5 tail). No Spark — the kernel is a pure
  * per-row function, and the question is per-pass CPU. */
object PiiProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    // the x66 augmentation formula over a ~730-char base text
    val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 13).trim
    val rows = (0 until n).map { id =>
      base + s" ip ${id % 200 + 1}.${id % 250}.7.${id % 9}" +
        s" ver 1.2.${id % 9}.4.5 twin 9.9.9.9 8.8.8.${id % 9}" +
        s" tel +1 415 555 ${id % 9000 + 1000} px +5 10-20 m$id@ex.org"
    }.toArray

    val email = Pattern.compile(PiiOps.EmailPattern)
    val ipv4 = Pattern.compile(PiiOps.Ipv4Pattern)
    val phone = Pattern.compile(PiiOps.PhonePattern)

    def pass(label: String)(f: String => String): Unit = {
      var best = Long.MaxValue
      var out = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < rows.length) { out += f(rows(i)).length; i += 1 }
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"  $label%-28s ${best / 1e6}%8.1f ms  (${best / 1e3 / n}%6.1f us/row)  [$out]")
    }

    println(s"PiiProfile: $n rows x ${rows(0).length} chars, min of $reps")
    pass("email replace")(s =>
      email.matcher(s).replaceAll(PiiOps.EmailToken))
    pass("ipv4 replace (x1)")(s =>
      ipv4.matcher(s).replaceAll("$1" + PiiOps.Ipv4Token + "$3"))
    pass("phone replace")(s =>
      phone.matcher(s).replaceAll(PiiOps.PhoneToken))
    pass("email find-only")(s => { val m = email.matcher(s); var c = 0
      while (m.find()) c += 1; if (c > 0) "x" else "" })
    pass("ipv4 find-only")(s => { val m = ipv4.matcher(s); var c = 0
      while (m.find()) c += 1; if (c > 0) "x" else "" })
    pass("phone find-only")(s => { val m = phone.matcher(s); var c = 0
      while (m.find()) c += 1; if (c > 0) "x" else "" })
    pass("full kernel scan") { s =>
      val r = graft.expressions.PiiScanOps.scan(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      r.getUTF8String(0).toString
    }
    pass("md5 of redacted") { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).length.toString
    }
  }
}
