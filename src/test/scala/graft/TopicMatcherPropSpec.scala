package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.sources.TopicMatcher

/** Property-based invariants of MQTT topic-filter matching. */
object TopicMatcherPropSpec extends Properties("TopicMatcher") {

  private val level: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(s =>
      !s.contains("/") && !s.contains("+") && !s.contains("#"))

  private val topic: Gen[String] =
    Gen.nonEmptyListOf(level).map(_.mkString("/"))

  property("a literal topic matches itself") = forAll(topic) { t =>
    TopicMatcher.matches(t, t)
  }

  property("# matches every non-$ topic") = forAll(topic) { t =>
    TopicMatcher.matches(t, "#")
  }

  property("replacing any single level with + still matches") =
    forAll(topic) { t =>
      val levels = t.split("/", -1)
      levels.indices.forall { i =>
        val f = levels.updated(i, "+").mkString("/")
        TopicMatcher.matches(t, f)
      }
    }

  property("a filter with extra levels never matches") =
    forAll(topic, level) { (t, extra) =>
      !TopicMatcher.matches(t, t + "/" + extra)
    }

  property("trailing /# matches the parent and all children") =
    forAll(topic, level) { (t, child) =>
      TopicMatcher.matches(t, t + "/#") &&
        TopicMatcher.matches(t + "/" + child, t + "/#")
    }

  property("$share wrapper is transparent") = forAll(topic) { t =>
    TopicMatcher.matches(t, s"$$share/g1/$t") == TopicMatcher.matches(t, t)
  }

  property("a different literal topic does not match") =
    forAll(topic, topic) { (a, b) =>
      (a == b) || !TopicMatcher.matches(a, b)
    }
}
