package graft.tools

import graft.taggers.TaggerRegistry

/** `dolma list` parity (cli/tagger.py:154-172 ListTaggerCli, cli/main.py
  * command "list"): print the tagger registry as a sorted name/class
  * table, after importing any user tagger modules given as args (the
  * CLI's `tagger_modules`). The scoped-out reference names are appended
  * with their in-engine equivalents so a dolma user can see the mapping
  * instead of a bare miss.
  */
object ListTaggers {

  /** (name, implementing class) for every registered tagger, sorted.
    * Resolving invokes the factory (the registry stores factories, not
    * classes; models behind them are lazy so this is cheap) — a factory
    * that throws on this machine lists as unavailable instead of
    * aborting the whole table. */
  def listing(modules: Seq[String] = Nil): Seq[(String, String)] = {
    TaggerRegistry.importModules(modules)
    TaggerRegistry.names.map { n =>
      n -> (scala.util.Try(TaggerRegistry.resolve(n).getClass.getName)
        .recover { case e => s"UNAVAILABLE: ${e.getMessage}" }.get)
    }
  }

  /** Fixed-width table lines (the reference renders a rich.Table; the
    * information content — sorted name + class columns — is the same). */
  def render(rows: Seq[(String, String)], title: String = "graft taggers",
      header: (String, String) = ("name", "class")): Seq[String] = {
    val w1 = (header._1 +: rows.map(_._1)).map(_.length).max
    val w2 = (header._2 +: rows.map(_._2)).map(_.length).max
    def line(a: String, b: String) = s"| ${a.padTo(w1, ' ')} | ${b.padTo(w2, ' ')} |"
    val sep = s"+${"-" * (w1 + 2)}+${"-" * (w2 + 2)}+"
    Seq(title, sep, line(header._1, header._2), sep) ++
      rows.map((line _).tupled) :+ sep
  }

  def main(args: Array[String]): Unit = {
    render(listing(args.toSeq)).foreach(println)
    val scoped = TaggerRegistry.scopedOutAliases.toSeq.sortBy(_._1)
      .map { case (n, (eq, why)) => n -> s"$why — use $eq" }
    render(scoped, title = "\nreference names scoped out (with equivalents)",
      header = ("name", "status")).foreach(println)
  }
}
