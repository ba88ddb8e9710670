package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Code-corpus curation: language routing, license detection, comment
 * stripping (string-literal safety, unterminated blocks), line-shape
 * stats, SQL registration, and semantic decontamination. */
class CodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lang(path: String, text: String): String =
    Seq((path, text)).toDF("path", "text")
      .select(Code.codeLanguage(col("path"), col("text")))
      .collect().head.getString(0)

  test("language routes by extension first") {
    assert(lang("src/main.py", "") === "python")
    assert(lang("a/b/Thing.SCALA", "") === "scala") // case-insensitive ext
    assert(lang("x.tar.cc", "") === "cpp")          // last dot wins
    assert(lang("mod.rs", "") === "rust")
    assert(lang("f.xyz", "") === "unknown")         // unmapped ext, no shebang
  }

  test("shebang fallback for extensionless files; extension beats shebang") {
    assert(lang("bin/tool", "#!/usr/bin/env python\nprint(1)") === "python")
    assert(lang("bin/tool", "#!/usr/bin/env node\nx") === "javascript")
    assert(lang("bin/run", "#!/bin/bash\nx") === "shell")
    assert(lang("bin/run", "#!/bin/sh\nx") === "shell")
    assert(lang("bin/run", "#!/usr/bin/wat\nx") === "unknown")
    // a mapped extension wins even when a shebang disagrees
    assert(lang("tool.rb", "#!/usr/bin/env python\n") === "ruby")
    // a dotfile's leading dot is not an extension separator
    assert(lang(".gitignore", "") === "unknown")
  }

  private def lic(text: String): (String, Boolean) = {
    val r = Seq(Tuple1(text)).toDF("text")
      .select(Code.detectLicense(col("text")).as("l"))
      .select(col("l.license"), col("l.permissive")).collect().head
    (r.getString(0), r.getBoolean(1))
  }

  test("SPDX tag wins over phrases and is taken verbatim") {
    assert(lic("// SPDX-License-Identifier: MPL-2.0\n" +
      "Permission is hereby granted, free of charge") === (("MPL-2.0", false)))
    assert(lic("# SPDX-License-Identifier:   Apache-2.0  \ncode") ===
      (("Apache-2.0", true)))
  }

  test("phrase table: first match, LGPL before GPL, permissive set") {
    assert(lic("Permission is hereby granted, free of charge, to any person")
      === (("MIT", true)))
    assert(lic("Licensed under the Apache License, Version 2.0") ===
      (("Apache-2.0", true)))
    assert(lic("Redistribution and use in source and binary forms, with or without")
      === (("BSD-3-Clause", true)))
    assert(lic("under the GNU Lesser General Public License as published") ===
      (("LGPL-3.0-only", false)))
    assert(lic("under the terms of the GNU General Public License") ===
      (("GPL-3.0-only", false)))
    assert(lic("subject to the Mozilla Public License, v. 2.0") ===
      (("MPL-2.0", false)))
    assert(lic("This is free and unencumbered software released into the public domain")
      === (("Unlicense", true)))
    assert(lic("no license text here") === (("none", false)))
  }

  test("license scan is bounded to the 2000-char header region") {
    val pad = "x" * 2001
    assert(lic(pad + " Permission is hereby granted, free of charge") ===
      (("none", false)))
  }

  private def strip(text: String, language: String): String =
    Seq((text, language)).toDF("text", "lang")
      .select(Code.stripComments(col("text"), col("lang")))
      .collect().head.getString(0)

  test("c-family: line + block comments, strings protect markers") {
    assert(strip("int x = 1; // tail\ny = 2;", "c") === "int x = 1; \ny = 2;")
    // block spanning lines: everything inside (newline included) drops
    assert(strip("a /* b\nc */ d", "java") === "a  d")
    // comment markers inside string literals survive
    assert(strip("s = \"a // b /* c */\"; // real", "javascript") ===
      "s = \"a // b /* c */\"; ")
    // an escaped quote does not close the string
    assert(strip("s = \"a \\\" // still string\"; // c", "scala") ===
      "s = \"a \\\" // still string\"; ")
    // unterminated block drops to EOF
    assert(strip("x = 1; /* open", "go") === "x = 1; ")
    // a single slash is not a comment
    assert(strip("a / b // c", "c") === "a / b ")
  }

  test("hash family and sql family") {
    assert(strip("x = 1  # note\ny = '#not'\n", "python") ===
      "x = 1  \ny = '#not'\n")
    assert(strip("#!shebang lines strip too\nz=1", "shell") === "\nz=1")
    assert(strip("SELECT 1 -- c\nFROM t WHERE s='a -- b' /* x\ny */ LIMIT 1", "sql")
      === "SELECT 1 \nFROM t WHERE s='a -- b'  LIMIT 1")
    // sql has no // comments; a lone '-' is code
    assert(strip("a - b -- c", "sql") === "a - b ")
  }

  test("unknown languages pass through verbatim; empty text is empty") {
    val t = "anything // at all # here"
    assert(strip(t, "markdown") === t)
    assert(strip(t, "unknown") === t)
    assert(strip("", "c") === "")
  }

  private def stats(text: String) =
    Seq(Tuple1(text)).toDF("text")
      .select(Code.codeStats(col("text")).as("s")).select(
        col("s.n_lines"), col("s.max_line_len"), col("s.mean_line_len"),
        col("s.frac_long_lines"), col("s.alnum_ratio"), col("s.autogen"))
      .collect().head

  test("codeStats hand-computed") {
    val r = stats("ab\ncdef\n")         // lines: "ab", "cdef", ""
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 4)
    assert(r.getDouble(2) === 2.0)      // (2+4+0)/3
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 6.0 / 8)  // 6 alnum of 8 chars (2 newlines count)
    assert(!r.getBoolean(5))
  }

  test("codeStats: long lines, autogen marker, empty text") {
    val r = stats("// Auto-Generated by tooling. DO NOT EDIT\n" + ("y" * 101))
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 101)
    assert(r.getDouble(3) === 0.5)
    assert(r.getBoolean(5))
    val e = stats("")
    assert(e.getInt(0) === 1 && e.getInt(1) === 0 && e.getDouble(4) === 0.0)
  }

  test("functions are SQL-callable and survive codegen") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT code_language('a.py', '') AS l,
        |       detect_license('SPDX-License-Identifier: MIT').permissive AS p,
        |       strip_comments('x; // c', 'c') AS s,
        |       code_stats('ab').n_lines AS n""".stripMargin).collect().head
    assert(r.getString(0) === "python" && r.getBoolean(1) &&
      r.getString(2) === "x; " && r.getInt(3) === 1)
  }

  test("semanticDecontaminate drops same-cell near-copies of benchmark rows") {
    val cents = (0 until 2).map(i =>
      i -> Array.tabulate(4)(j => if (j == i) 1.0 else 0.0)).toArray
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),   // exact copy of bench 100 -> leaked
      (2L, Seq(0.9, 0.1, 0.0, 0.0)),   // same cell, cosine ~0.993 < 0.999 -> kept
      (3L, Seq(0.0, 1.0, 0.0, 0.0)))   // other cell, no bench rows -> kept
      .toDF("id", "vec")
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("id", "vec")
    val kept = Similarity.semanticDecontaminate(
        corpus, bench, "id", "vec", cents, 0.999)
      .collect().map(r => r.getLong(0)).sorted
    assert(kept.toSeq === Seq(2L, 3L))
    // the keyed-join fallback (large benchmark posture) agrees
    val kept2 = Similarity.semanticDecontaminate(
        corpus, bench, "id", "vec", cents, 0.999, broadcastBench = false)
      .collect().map(r => r.getLong(0)).sorted
    assert(kept2.toSeq === Seq(2L, 3L))
  }
}
