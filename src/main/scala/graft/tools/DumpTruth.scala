package graft.tools

import graft.core.TokenGen
import graft.functions.Multimodal
import graft.signal.{Butterworth, Ppg, Qrs}
import java.io.PrintWriter
import java.math.{BigDecimal => JBD, RoundingMode}

/** Oracle-development harness (no Spark): dumps the engine kernels'
  * ground truth for the three decision-rule/codec queries as TSVs, plus
  * the generated oracle SQL, so the DuckDB replays can be verified
  * directly (tools/check_oracles.py) without a full verify cycle.
  * Usage: sbt "runMain graft.tools.DumpTruth /tmp/oracledev" */
object DumpTruth {

  private def sparkRound6(v: Double): Double =
    new JBD(java.lang.Double.toString(v)).setScale(6, RoundingMode.HALF_UP)
      .doubleValue

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/oracledev")
    new java.io.File(dir).mkdirs()
    def write(name: String)(f: PrintWriter => Unit): Unit = {
      val pw = new PrintWriter(s"$dir/$name")
      try f(pw) finally pw.close()
    }

    val docs = (0 until 64).map(i => TokenGen.makeDoc(i.toLong, false))

    write("truth_rpeaks.tsv") { pw =>
      docs.foreach { d =>
        val vs = d.tokens.map(_.toDouble)
        if (vs.length > 120)
          Qrs.rpeaksHamiltonTompkins(vs, 128.0).foreach { p =>
            pw.println(s"${d.doc_id}\t$p\t${vs(p)}")
          }
      }
    }
    write("truth_pulse.tsv") { pw =>
      docs.foreach { d =>
        val vs = d.tokens.map(_.toDouble)
        if (vs.length > 1280)
          Ppg.pulseOnsetPhysionet(vs, 128).foreach { p =>
            pw.println(s"${d.doc_id}\t$p\t${vs(p)}")
          }
      }
    }
    // intermediates, for drill-down when the end compare disagrees
    write("truth_fecg.tsv") { pw =>
      docs.foreach { d =>
        val vs = d.tokens.map(_.toDouble)
        if (vs.length > 120)
          Qrs.filterHamiltonTompkins(vs, 128.0).zipWithIndex.foreach {
            case (v, i) => pw.println(f"${d.doc_id}\t$i\t$v%.17g")
          }
      }
    }
    write("truth_ss.tsv") { pw =>
      docs.foreach { d =>
        val vs = d.tokens.map(_.toDouble)
        if (vs.length > 1280) {
          val c = Butterworth.design(5, Seq(0.5 / 64, 20.0 / 64),
            Butterworth.Bandpass)
          Ppg.slopeSum(Butterworth.filtfilt(c, vs), 19).zipWithIndex
            .foreach { case (v, i) =>
              pw.println(f"${d.doc_id}\t$i\t$v%.17g")
            }
        }
      }
    }
    write("truth_ffp.tsv") { pw =>
      val c = Butterworth.design(5, Seq(0.5 / 64, 20.0 / 64),
        Butterworth.Bandpass)
      docs.foreach { d =>
        val vs = d.tokens.map(_.toDouble)
        if (vs.length > 1280)
          Butterworth.filtfilt(c, vs).zipWithIndex.foreach { case (v, i) =>
            pw.println(f"${d.doc_id}\t$i\t$v%.17g")
          }
      }
    }
    write("truth_coeffs.tsv") { pw =>
      val c = Butterworth.design(5, Seq(0.5 / 64, 20.0 / 64),
        Butterworth.Bandpass)
      val zi = Butterworth.lfilterZi(c)
      pw.println("b\t" + c.b.mkString(","))
      pw.println("a\t" + c.a.mkString(","))
      pw.println("zi\t" + zi.mkString(","))
    }
    write("truth_media.tsv") { pw =>
      (0L until 200L).foreach { i =>
        Multimodal.frameFeaturesOf(Multimodal.makeBlob(i), 2).foreach { f =>
          pw.println(s"${f.doc_id}\t${f.frame}\t${f.width}\t${f.height}" +
            s"\t${sparkRound6(f.mean_px + 1e-9)}\t${f.max_px}" +
            s"\t${f.frame_hash}")
        }
      }
    }
    import graft.queries.SignalQueries.oracle
    write("oracle_rpeaks.sql")(_.print(oracle("q_rpeaks")))
    write("oracle_pulse.sql")(_.print(oracle("q_pulse_onsets")))
    write("oracle_media.sql")(_.print(oracle("q_media_features")))
    println(s"dumped to $dir")
  }
}
