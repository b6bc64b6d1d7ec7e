package graft

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Forecast

/** ScalaCheck-generator-driven properties for the window clamp
  * (SURVEY.md §5.3): for ANY input/today combination the window is
  * well-formed, bounded, and contains what it should. (Raw Gen sampling —
  * the scalatest/scalacheck bridge artifact is not in the offline cache.)
  */
class ClampPropertySpec extends AnyFunSuite {

  val epoch: LocalDate = LocalDate.parse("2020-01-01")
  val genPair: Gen[(LocalDate, LocalDate)] = for {
    i <- Gen.choose(0L, 2000L)
    t <- Gen.choose(0L, 2030L)
  } yield (epoch.plusDays(i), epoch.plusDays(t))

  /** 500 deterministic samples of (input, today), both <= MaxDate (the API
    * rejects inputs beyond the cap before clamping — main.py:196).
    */
  def samples: Seq[(LocalDate, LocalDate)] =
    Iterator
      .iterate(Seed(42L))(_.next)
      .map(s => genPair.apply(Gen.Parameters.default, s))
      .collect { case Some(p) => p }
      .filter { case (i, t) => !i.isAfter(Forecast.MaxDate) && !t.isAfter(Forecast.MaxDate) }
      .take(500)
      .toSeq

  test("window is always well-formed, <= 7 days, within [today, maxDate]") {
    samples.foreach { case (input, today) =>
      val (s, e) = Forecast.windowClamp(input, today)
      assert(!s.isAfter(e), s"start $s after end $e for input=$input today=$today")
      assert(ChronoUnit.DAYS.between(s, e) <= 6, s"window wider than 7 days for $input/$today")
      assert(!s.isBefore(today), s"window starts before today for $input/$today")
      assert(!e.isAfter(Forecast.MaxDate), s"window ends beyond cap for $input/$today")
    }
  }

  test("mid-range inputs are centered; near-edge inputs touch the edge") {
    samples.foreach { case (input, today) =>
      val dft = ChronoUnit.DAYS.between(today, input)
      val dtm = ChronoUnit.DAYS.between(input, Forecast.MaxDate)
      val (s, e) = Forecast.windowClamp(input, today)
      if (dft <= 3) assert(s === today, s"$input/$today")
      else if (dtm <= 3) assert(e === Forecast.MaxDate, s"$input/$today")
      else assert(!input.isBefore(s) && !input.isAfter(e), s"input outside window for $input/$today")
    }
  }

  test("scalar and fixture-query constants agree (window used by o24/o42)") {
    val (s, e) = Forecast.windowClamp(ServingQueries.InputDate, ServingQueries.Today)
    assert(s === ServingQueries.winStart && e === ServingQueries.winEnd)
    assert(s === LocalDate.parse("2024-01-28") && e === LocalDate.parse("2024-02-03"))
  }
}
