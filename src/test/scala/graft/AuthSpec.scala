package graft.auth

import graft.auth.{IamPolicy, TableAcl}
import graft.auth.IamPolicy._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class AuthSpec extends AnyFunSuite {

  /** Plain-scalacheck property driver (scalatestplus is not in the offline
    * dependency cache): evaluate the predicate over 100 generated samples. */
  private def forAllSampled[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed)(_.next).take(100).foreach { sd =>
      val a = ga.apply(Gen.Parameters.default, sd)
      val b = gb.apply(Gen.Parameters.default, sd.next)
      for (x <- a; y <- b) f(x, y)
    }
  }

  private val svc = Gen.oneOf("s3", "dynamodb", "rds", "ssm")
  private val act = Gen.oneOf("GetObject", "PutItem", "Query", "DescribeDBInstances")
  private val genAction: Gen[String] = for (s <- svc; a <- act) yield s"$s:$a"
  private val genResource: Gen[String] =
    Gen.oneOf("arn:aws:s3:::bucket/a", "arn:aws:s3:::bucket/b",
      "arn:aws:dynamodb:us-east-1:1:table/Logverz-Queries")

  test("explicit deny always beats allow (property)") {
    forAllSampled(genAction, genResource) { (a, r) =>
      val p = Policy(Seq(
        Statement(Allow, action = Seq("*"), resource = Seq("*")),
        Statement(Deny, action = Seq("*"), resource = Seq("*"))))
      assert(evaluate(Seq(p), a, r) == ExplicitDeny)
    }
  }

  test("deny applies on action match alone, ignoring the deny's resources") {
    // authenticationsharedv3.js:6-29: deny statements go through
    // getmatchingaction only — a deny scoped to resource X still denies
    // the action against resource Y (fail-closed, unlike AWS IAM).
    val p = Policy(Seq(
      Statement(Allow, action = Seq("sql:Select"), resource = Seq("*")),
      Statement(Deny, action = Seq("sql:Select"),
        resource = Seq("arn:table/secret"))))
    assert(evaluate(Seq(p), "sql:Select", "arn:table/public") == ExplicitDeny)
    assert(evaluate(Seq(p), "sql:Select", "arn:table/secret") == ExplicitDeny)
    // a deny on a different action does not block
    val p2 = Policy(Seq(
      Statement(Allow, action = Seq("sql:Select"), resource = Seq("*")),
      Statement(Deny, action = Seq("sql:Drop"), resource = Seq("*"))))
    assert(evaluate(Seq(p2), "sql:Select", "arn:table/public") == Allowed)
  }

  test("no applicable statement is implicit deny (property)") {
    forAllSampled(genAction, genResource) { (a, r) =>
      assert(evaluate(Seq(Policy(Nil)), a, r) == ImplicitDeny)
    }
  }

  test("administrator access allows everything (property)") {
    forAllSampled(genAction, genResource) { (a, r) =>
      assert(isAllowed(Seq(administratorAccess), a, r))
    }
  }

  test("wildcard action matching is case-insensitive with * and ?") {
    assert(wildcardMatch("s3:Get*", "s3:getobject"))
    assert(wildcardMatch("s3:*", "s3:PutObject"))
    assert(!wildcardMatch("s3:Get*", "dynamodb:GetItem"))
    assert(wildcardMatch("s3:GetObjec?", "s3:GetObject"))
  }

  test("NotAction applies to everything outside the list") {
    val p = Policy(Seq(Statement(Allow, notAction = Seq("s3:Delete*"),
      resource = Seq("*"))))
    assert(isAllowed(Seq(p), "s3:GetObject", "arn:aws:s3:::b/k"))
    assert(!isAllowed(Seq(p), "s3:DeleteObject", "arn:aws:s3:::b/k"))
  }

  test("resource matching restricts allows; NotResource inverts") {
    val p = Policy(Seq(Statement(Allow, action = Seq("s3:*"),
      resource = Seq("arn:aws:s3:::bucket/a*"))))
    assert(isAllowed(Seq(p), "s3:GetObject", "arn:aws:s3:::bucket/a/x"))
    assert(!isAllowed(Seq(p), "s3:GetObject", "arn:aws:s3:::other"))
    val np = Policy(Seq(Statement(Allow, action = Seq("s3:*"),
      notResource = Seq("arn:aws:s3:::secret/*"))))
    assert(isAllowed(Seq(np), "s3:GetObject", "arn:aws:s3:::bucket/a"))
    assert(!isAllowed(Seq(np), "s3:GetObject", "arn:aws:s3:::secret/x"))
  }

  test("bidirectional resource match accepts wildcard requests") {
    val p = Policy(Seq(Statement(Allow, action = Seq("s3:*"),
      resource = Seq("arn:aws:s3:::bucket/a"))))
    assert(isAllowed(Seq(p), "s3:ListBucket", "arn:aws:s3:::bucket/*"))
  }

  test("single-quoted stringified policies parse (reference storage format)") {
    val p = IamPolicy.parse(
      "{'Version':'2012-10-17','Statement':[{'Effect':'Allow'," +
        "'Action':['s3:Get*'],'Resource':'*'}]}")
    assert(p.statements.head.action == Seq("s3:Get*"))
    assert(isAllowed(Seq(p), "s3:GetObject", "anything"))
  }

  test("identity association expands groups and policies like the reference") {
    val spark = graft.TestSession.spark
    import graft.auth.Identities
    import graft.auth.Identities.Entry
    val allowSelect =
      "{'Statement':[{'Effect':'Allow','Action':'sql:Select','Resource':'*'}]}"
    val denyDrop =
      "{'Statement':[{'Effect':'Deny','Action':'sql:Drop','Resource':'*'}]}"
    val managedDoc =
      "{\"Statement\":[{\"Effect\":\"Allow\",\"Action\":\"sql:Describe\",\"Resource\":\"*\"}]}"
    val reg = Identities.toDF(spark, Seq(
      Entry("analysts", "GroupAWS", IAM = true, Nil, Nil,
        Seq(denyDrop), Seq(allowSelect), Nil, None),
      Entry("ReadOnlyAccess", "PolicyAWS", IAM = true, Nil, Nil,
        Nil, Nil, Nil, Some(managedDoc))))
    val user = Identities.addUser("dana", "UserGoogle",
      iamGroups = Seq("analysts"), iamPolicies = Seq("ReadOnlyAccess"))
    val e = Identities.associateUserPolicies(reg, user)
    assert(e.GroupInline == Seq(denyDrop))
    assert(e.GroupAttached == Seq(allowSelect))
    assert(e.UserAttached.length == 1 &&
      e.UserAttached.head.startsWith("{\"PolicyName\":\"ReadOnlyAccess\""))
    // UserAttached wrapper stores the doc single-quoted, and still parses
    assert(!e.UserAttached.head.split("PolicyDocument")(1).contains('"' + "S"))
    import graft.auth.IamPolicy._
    assert(Identities.decide(reg, user, "sql:Select", "any") == Allowed)
    assert(Identities.decide(reg, user, "sql:Describe", "any") == Allowed)
    assert(Identities.decide(reg, user, "sql:Drop", "any") == ExplicitDeny)
    assert(Identities.decide(reg, user, "sql:Insert", "any") == ImplicitDeny)
    // unknown references fail loudly, not silently permissive
    intercept[IllegalArgumentException] {
      Identities.associateUserPolicies(reg,
        Identities.addUser("x", "UserGoogle", iamGroups = Seq("ghosts")))
    }
  }

  test("table ACL decision matrix") {
    import TableAcl._
    val grants = TableGrants(owners = Set("alice", "team1"),
      access = Set("bob"))
    assert(authorize(Identity("alice"), grants, Modify))
    assert(authorize(Identity("carol", groups = Set("team1")), grants, Modify))
    assert(!authorize(Identity("bob"), grants, Modify))
    assert(authorize(Identity("bob"), grants, Query))
    assert(!authorize(Identity("mallory"), grants, Query))
    assert(authorize(Identity("root", isAdmin = true), grants, Modify))
    assert(authorize(Identity("pu", isPowerUser = true), grants, Query))
    assert(!authorize(Identity("pu", isPowerUser = true), grants, Modify))
    assert(allowedTables(Identity("bob"),
      Map("t1" -> grants, "t2" -> TableGrants(Set("x"), Set("y"))),
      Query) == Set("t1"))
  }
}
