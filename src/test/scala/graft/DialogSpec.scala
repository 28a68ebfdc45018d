package graft

import graft.functions.Dialog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DialogSpec extends SparkSpec {
  import spark.implicits._

  private def flags(turns: Seq[(String, String)]): Row = {
    val df = Seq(Tuple1(turns)).toDF("raw")
      .select(transform(col("raw"),
        t => struct(t.getField("_1").as("role"), t.getField("_2").as("content")))
        .as("turns"))
    df.select(Dialog.dialogFlags(col("turns")).as("f")).select(col("f.*")).head()
  }

  private def field(r: Row, name: String): Any = r.get(r.fieldIndex(name))

  test("dialogFlags: a well-formed dialog passes every check") {
    val r = flags(Seq(
      "system" -> "You are helpful.",
      "user" -> "hi", "assistant" -> "hello",
      "user" -> "thanks", "assistant" -> "welcome"))
    assert(field(r, "n_turns") == 5 && field(r, "has_system") == true)
    assert(field(r, "starts_user") == true && field(r, "ends_assistant") == true)
    assert(field(r, "roles_ok") == true && field(r, "alternates") == true)
    assert(field(r, "has_empty") == false && field(r, "dup_turn") == false)
    assert(field(r, "user_chars") == 8 && field(r, "assistant_chars") == 12)
    assert(field(r, "valid") == true)
  }

  test("dialogFlags: each defect trips exactly its flag") {
    // double assistant: alternation breaks, roles stay ok
    val dbl = flags(Seq("user" -> "a", "assistant" -> "b", "assistant" -> "c"))
    assert(field(dbl, "alternates") == false && field(dbl, "roles_ok") == true)
    assert(field(dbl, "valid") == false)
    // empty turn (whitespace counts as empty)
    val empty = flags(Seq("user" -> "a", "assistant" -> "  "))
    assert(field(empty, "has_empty") == true && field(empty, "valid") == false)
    // consecutive duplicate non-empty content (system turn included)
    val dup = flags(Seq("user" -> "same", "assistant" -> "same"))
    assert(field(dup, "dup_turn") == true && field(dup, "valid") == false)
    // foreign role in the body
    val tool = flags(Seq("tool" -> "x", "assistant" -> "y"))
    assert(field(tool, "roles_ok") == false && field(tool, "starts_user") == false)
    // assistant-first / user-last orderings
    assert(field(flags(Seq("assistant" -> "a", "user" -> "b")), "valid") == false)
    assert(field(flags(
      Seq("user" -> "a", "assistant" -> "b", "user" -> "c")), "ends_assistant") == false)
    // system only allowed in front: mid-dialog system fails roles_ok
    val midSys = flags(Seq("user" -> "a", "system" -> "s", "assistant" -> "b"))
    assert(field(midSys, "roles_ok") == false)
  }

  test("dialogFlags: degenerate shapes — empty, single-turn, system-only, null content") {
    val empty = flags(Seq.empty)
    assert(field(empty, "n_turns") == 0 && field(empty, "valid") == false)
    assert(field(empty, "user_chars") == 0 && field(empty, "assistant_chars") == 0)
    val single = flags(Seq("user" -> "hi"))
    assert(field(single, "valid") == false) // no assistant reply
    val sysOnly = flags(Seq("system" -> "s"))
    assert(field(sysOnly, "has_system") == true && field(sysOnly, "valid") == false)
    val nullContent = flags(Seq("user" -> null, "assistant" -> "b"))
    assert(field(nullContent, "has_empty") == true &&
      field(nullContent, "valid") == false)
    assert(field(nullContent, "user_chars") == 0)
  }

  test("dialogFlags: null array yields zeroed, invalid flags") {
    val df = Seq(Tuple1(Seq("user" -> "a"))).toDF("raw")
      .select(transform(col("raw"),
        t => struct(t.getField("_1").as("role"), t.getField("_2").as("content")))
        .as("turns"))
      .select(when(lit(false), col("turns")).as("turns")) // null of the right type
    val r = df.select(Dialog.dialogFlags(col("turns")).as("f"))
      .select(col("f.*")).head()
    assert(field(r, "n_turns") == 0 && field(r, "valid") == false)
    assert(field(r, "user_chars") == 0 && field(r, "assistant_chars") == 0)
  }
}
