package graft.tools

/** Dev utility: print one query's oracle SQL to stdout so the house
  * protocol (dry-run the SQL standalone in python-duckdb before wiring a
  * new query) needs no regex extraction from OracleSql.scala. */
object DumpOracle {
  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq(name) =>
      graft.OracleSql.all.get(name) match {
        case Some(sql) => println(sql)
        case None =>
          System.err.println(s"no oracle for '$name'; known: " +
            graft.OracleSql.all.keys.toSeq.sorted.mkString(", "))
          sys.exit(1)
      }
    case _ =>
      System.err.println("usage: DumpOracle <query_name>")
      sys.exit(2)
  }
}
