package graft

import graft.operators.{Renest, Shred}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §7.4 "generic-depth shredding": the reference recurses over
  * runtime VALUES; we recurse over the SCHEMA — so shred/renest must work
  * for shapes deeper than the reference's 3-level plan. This spec uses a
  * 4-level document (org → dept[] → team[] → member[]) with node structs
  * at every level. */
class DeepNestSpec extends SparkSpec {

  private val memberT = StructType(Seq(
    StructField("objectId", StringType), StructField("objectType", StringType),
    StructField("name", StringType)))
  private val teamT = StructType(Seq(
    StructField("objectId", StringType), StructField("objectType", StringType),
    StructField("focus", StringType),
    StructField("lead", memberT),
    StructField("members", ArrayType(memberT))))
  private val deptT = StructType(Seq(
    StructField("objectId", StringType), StructField("objectType", StringType),
    StructField("budget", DoubleType),
    StructField("teams", ArrayType(teamT))))
  private val orgT = StructType(Seq(
    StructField("objectId", StringType), StructField("objectType", StringType),
    StructField("region", StringType),
    StructField("depts", ArrayType(deptT))))

  private def orgJson(id: String, nDepts: Int, nTeams: Int, nMembers: Int): String = {
    def member(t: String, i: Int) =
      s"""{"objectId":"m$t-$i","objectType":"member","name":"person$i"}"""
    def team(d: String, i: Int) = {
      val tid = s"$d-$i"
      s"""{"objectId":"t$tid","objectType":"team","focus":"f$i",
          "lead":${member(tid + "L", 0)},
          "members":[${(1 to nMembers).map(member(tid, _)).mkString(",")}]}"""
        .replaceAll("\n\\s*", "")
    }
    def dept(i: Int) = {
      val did = s"$id-$i"
      s"""{"objectId":"d$did","objectType":"dept","budget":${i * 100}.0,
          "teams":[${(1 to nTeams).map(team(did, _)).mkString(",")}]}"""
        .replaceAll("\n\\s*", "")
    }
    s"""{"objectId":"$id","objectType":"org","region":"emea",
        "depts":[${(1 to nDepts).map(dept).mkString(",")}]}"""
      .replaceAll("\n\\s*", "")
  }

  private lazy val docs = {
    import spark.implicits._
    spark.createDataset(Seq(orgJson("A", 2, 2, 3), orgJson("B", 1, 1, 1)))
      .toDF("j").select(from_json(col("j"), orgT).as("d")).select("d.*")
  }

  test("4-level shred: every node level lands in its own typed table") {
    val typed = Shred.shredTyped(docs)
    assert(typed.keySet == Set("", "depts", "depts.teams",
      "depts.teams.lead", "depts.teams.members"))
    assert(typed("").count() == 2)
    assert(typed("depts").count() == 3)             // 2 + 1
    assert(typed("depts.teams").count() == 5)       // 4 + 1
    assert(typed("depts.teams.lead").count() == 5)
    assert(typed("depts.teams.members").count() == 13) // 4*3 + 1
    // routing: every 4th-level member carries the org root key
    val m = typed("depts.teams.members")
    assert(m.select("__rootKey").distinct().collect().map(_.getString(0)).toSet ==
      Set("org_A", "org_B"))
    // relNames compose parent_child types at depth
    val nodes = Shred.nodes(docs)
    assert(nodes.select("relName").distinct().collect().map(_.getString(0)).toSet ==
      Set("org", "org_dept", "dept_team", "team_member"))
  }

  test("4-level renest ∘ shred = identity") {
    val typed = Shred.shredTyped(docs)
    val back = Renest(typed, docs.schema)
    val a = docs.select(to_json(struct(docs.columns.map(col): _*)).as("j"))
      .collect().map(_.getString(0)).sorted.toSeq
    val b = back.select(to_json(struct(back.columns.map(col): _*)).as("j"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
  }

  test("deep subtree cascade removes exactly the subtree") {
    val nodes = Shred.nodes(docs).cache()
    // delete team tA-1-1: itself + its lead + 3 members = 5 nodes
    val after = graft.operators.Kv.cascadeDelete(nodes, "team_tA-1-1")
    assert(nodes.count() - after.count() == 5)
    assert(after.where(col("key") === "member_mA-1-1L-0").isEmpty)
    assert(after.where(col("key") === "dept_dA-1").count() == 1) // parent kept
  }
}
