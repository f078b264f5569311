"""The reference's 42-case end-to-end golden corpus, ported to transcripts.

Source: /root/reference/scala/src/test/scala/data/shortPhrases.xml (35
enabled <test> cases; the commented-out ones are skipped there too),
harness testDisambiguator.scala:483-542 — each phrase runs through the
full disambiguator and the resolved topic names are asserted.

The reference resolves against its Wikipedia-dump-derived model. That
model is not available (and shipping it would be a port, not a
re-expression), so this module carries a HAND-AUTHORED knowledge base
whose anchor priors and context graphs mirror the *shape* of the
Wikipedia statistics each case depends on: ambiguous surfaces carry
realistic prior skew (the popular sense dominates), and the expected
winner is reachable only through coherence (shared contexts / direct
links with the other mentions), exactly the property the reference
corpus was built to gate.

Round-4 closure: every reference expectation is now either asserted
VERBATIM or asserted with a machine-checked / documented correction —
no silent divergence remains:

  - case 10: 'Video card' and 'Integrated circuit' now pass verbatim
    (the KB carries the reference's standalone 'video'/'integration'
    hardware senses). The single remaining correction is
    'Platform game', which the reference file itself marks
    "Wrong. But not that important atm" (shortPhrases.xml:120) —
    asserted under the corrected expectation Computing platform, with
    the raw list kept in ``reference_expected``.
  - case 20: 'Economic sociology' passes verbatim (low-prior
    'economics' sense reachable only through wellbeing coherence).
  - case 28: 'Gene sequencing' is a redirect of 'DNA sequencing'; the
    dictionary resolves redirects at build time (A8). The raw
    reference list is kept in ``reference_expected`` and a dedicated
    test asserts it maps onto ``expected`` through the built redirect
    table — the waiver is checked, not prose.
"""

from __future__ import annotations

from careers_spark.synth import KB, Entity

# ---------------------------------------------------------------------------
# categories (contexts) — kept 4-digit-free so allowed_context passes them
# ---------------------------------------------------------------------------
_UNIV = ["Category:Universities", "Category:Higher education", "Category:Research universities"]
_POL = ["Category:American politicians", "Category:Republicans"]


def golden_kb() -> KB:
    kb = KB()
    E = kb.entities.append

    # --- universities / academia ------------------------------------------
    E(Entity("Main:Rice University",
             [("rice university", 90), ("rice", 40)], _UNIV + ["Main:Houston"]))
    E(Entity("Main:Imperial College London",
             [("imperial college london", 60), ("imperial college", 80)],
             _UNIV + ["Main:London"]))
    E(Entity("Main:University of Cambridge",
             [("university of cambridge", 120), ("cambridge university", 40),
              ("cambridge", 30)], _UNIV + ["Category:England"]))
    E(Entity("Main:University of Oxford",
             [("university of oxford", 110), ("oxford university", 40),
              ("oxford", 35)], _UNIV + ["Category:England"]))
    E(Entity("Main:Yale University", [("yale university", 70), ("yale", 60)], _UNIV))
    E(Entity("Main:Harvard University", [("harvard university", 80), ("harvard", 90)], _UNIV))
    E(Entity("Main:King's College, Cambridge",
             [("kings college", 30)],
             _UNIV + ["Main:University of Cambridge", "Main:Cambridge"]))
    E(Entity("Main:King's College London",
             [("kings college", 60), ("kings college london", 60)],
             _UNIV + ["Main:London"]))
    E(Entity("Main:University of London",
             [("university of london", 70)], _UNIV + ["Main:London"]))
    E(Entity("Main:London School of Economics",
             [("london school of economics", 80), ("lse", 40)],
             _UNIV + ["Main:University of London", "Main:Economics"]))
    E(Entity("Main:Hills Road Sixth Form College",
             [("hills road sixth form college", 20)],
             ["Category:Schools in England", "Main:Cambridge"]))
    E(Entity("Main:Bachelor of Arts",
             [("ba", 40), ("bachelor of arts", 50)],
             ["Category:Academic degrees", "Category:Universities"]))
    E(Entity("Main:British Airways",
             [("ba", 120), ("british airways", 100)], ["Category:Airlines"]))
    E(Entity("Main:Archaeology", [("archaeology", 60)],
             ["Category:Academic disciplines", "Category:Humanities"]))
    E(Entity("Main:Anthropology", [("anthropology", 60)],
             ["Category:Academic disciplines", "Category:Humanities"]))
    E(Entity("Main:Education", [("education", 100)],
             ["Category:Academic disciplines", "Category:Learning"]))
    E(Entity("Main:Political science", [("political science", 60)],
             ["Category:Academic disciplines", "Category:Social sciences"]))

    # --- places --------------------------------------------------------------
    E(Entity("Main:Cambridge", [("cambridge", 150)],
             ["Category:Cities in England", "Main:United Kingdom",
              "Category:Cambridgeshire"]))
    E(Entity("Main:Oxford", [("oxford", 140)],
             ["Category:Cities in England", "Category:Oxfordshire"]))
    E(Entity("Main:London", [("london", 400)],
             ["Category:Cities in England", "Main:United Kingdom"]))
    E(Entity("Main:United Kingdom", [("united kingdom", 300), ("uk", 150)],
             ["Category:Countries in Europe"]))
    E(Entity("Main:Houston", [("houston", 100)], ["Category:Cities in Texas"]))
    E(Entity("Main:Kuwait", [("kuwait", 90)], ["Category:Countries in Asia"]))

    # --- US / UK politics ----------------------------------------------------
    E(Entity("Main:Condoleezza Rice",
             [("condoleezza rice", 100), ("rice", 80), ("condi", 20)],
             _POL + ["Main:George W. Bush"]))
    E(Entity("Main:Rice", [("rice", 300)],
             ["Category:Cereals", "Category:Staple foods"]))
    E(Entity("Main:George W. Bush",
             [("george w bush", 150), ("george bush", 120), ("bush", 120)],
             _POL + ["Main:Dick Cheney", "Main:Donald Rumsfeld",
                     "Main:Condoleezza Rice",
                     "Category:Presidents of the United States"]))
    E(Entity("Main:George H. W. Bush",
             [("george h w bush", 90), ("george bush", 80), ("bush", 60)],
             _POL + ["Main:Gulf War",
                     "Category:Presidents of the United States"]))
    E(Entity("Main:Bush", [("bush", 200)], ["Category:Plants"]))
    E(Entity("Main:Dick Cheney", [("dick cheney", 90), ("cheney", 70)],
             _POL + ["Main:George W. Bush", "Main:Donald Rumsfeld"]))
    E(Entity("Main:Donald Rumsfeld", [("donald rumsfeld", 50), ("rumsfeld", 40)],
             _POL + ["Main:George W. Bush"]))
    E(Entity("Main:Republican Party (United States)",
             [("republican", 120), ("republican party", 80)],
             ["Category:Political parties in the United States",
              "Category:Republicans"]))
    E(Entity("Main:John Major", [("john major", 70)],
             ["Category:Prime Ministers of the United Kingdom",
              "Main:Gulf War", "Main:Prime Minister of the United Kingdom"]))
    E(Entity("Main:Prime Minister of the United Kingdom",
             [("prime minister", 60)],
             ["Category:Prime Ministers of the United Kingdom",
              "Category:Westminster system"]))
    E(Entity("Main:Prime minister", [("prime minister", 200)],
             ["Category:Positions of authority"]))
    E(Entity("Main:Gulf War", [("invasion of kuwait", 30), ("gulf war", 80)],
             ["Category:Wars involving the United States", "Main:Kuwait",
              "Main:George H. W. Bush"]))
    E(Entity("Main:Sarah Palin", [("sarah palin", 70), ("palin", 70)],
             _POL + ["Main:Tea Party movement"]))
    E(Entity("Main:Michael Palin", [("michael palin", 50), ("palin", 50)],
             ["Category:British comedians", "Main:Monty Python"]))
    E(Entity("Main:Tea Party movement", [("tea party movement", 40), ("tea party", 60)],
             ["Category:Political movements", "Category:Republicans",
              "Main:Sarah Palin"]))
    E(Entity("Main:Tea party", [("tea party", 40)], ["Category:Meals"]))
    E(Entity("Main:Monty Python", [("monty python", 90), ("python", 80)],
             ["Category:British comedy", "Main:Michael Palin"]))

    # --- programming / software ----------------------------------------------
    E(Entity("Main:Java (programming language)", [("java", 700)],
             ["Category:Programming languages",
              "Category:Object-oriented programming",
              "Main:Design pattern (computer science)"]))
    E(Entity("Main:Java", [("java", 100)],
             ["Category:Islands of Indonesia", "Main:Indonesia"]))
    E(Entity("Main:Python (programming language)", [("python", 300)],
             ["Category:Programming languages",
              "Category:Object-oriented programming"]))
    E(Entity("Main:Pythonidae", [("python", 60)], ["Category:Snakes"]))
    E(Entity("Main:C++", [("c", 120), ("cplusplus", 90)],
             ["Category:Programming languages",
              "Category:Object-oriented programming",
              "Main:Design pattern (computer science)"]))
    E(Entity("Main:C (programming language)", [("c", 200)],
             ["Category:Programming languages",
              "Category:Procedural programming"]))
    E(Entity("Main:Design pattern (computer science)",
             [("design patterns", 30), ("design pattern", 30)],
             ["Category:Software design",
              "Category:Object-oriented programming", "Main:C++"]))
    E(Entity("Main:Objective Caml", [("objective caml", 30), ("ocaml", 30)],
             ["Category:Programming languages",
              "Category:Functional programming languages"]))
    E(Entity("Main:Haskell (programming language)", [("haskell", 50)],
             ["Category:Programming languages",
              "Category:Functional programming languages"]))
    E(Entity("Main:Eddie Haskell", [("haskell", 30)],
             ["Category:Television characters"]))
    E(Entity("Main:Stata", [("stata", 50)],
             ["Category:Statistical software", "Category:Statistics"]))
    E(Entity("Main:R (programming language)", [("r", 60)],
             ["Category:Statistical software", "Category:Programming languages",
              "Category:Statistics"]))
    E(Entity("Main:R", [("r", 200)], ["Category:Latin letters"]))
    E(Entity("Main:Statistics", [("statistics", 150)],
             ["Category:Statistics", "Category:Mathematical sciences"]))
    E(Entity("Main:Econometrics",
             [("econometrics", 60), ("econometric methods", 30)],
             ["Category:Economics", "Category:Statistics"]))

    # --- desktop publishing (latex case) --------------------------------------
    E(Entity("Main:LaTeX", [("latex", 60)],
             ["Category:Typesetting software", "Category:Software", "Main:LyX"]))
    E(Entity("Main:Latex", [("latex", 200)], ["Category:Natural materials"]))
    E(Entity("Main:LyX", [("lyx", 30)],
             ["Category:Typesetting software", "Category:Software", "Main:LaTeX"]))
    E(Entity("Main:Printing", [("print", 40), ("printing", 60)],
             ["Category:Printing", "Category:Publishing"]))
    E(Entity("Main:Adobe InDesign", [("adobe indesign", 30)],
             ["Category:Desktop publishing software", "Category:Software",
              "Main:Adobe Systems"]))
    E(Entity("Main:Adobe Photoshop", [("photoshop", 50), ("adobe photoshop", 40)],
             ["Category:Graphics software", "Category:Software",
              "Main:Adobe Systems"]))
    E(Entity("Main:Adobe Systems", [("adobe", 100)],
             ["Category:Software companies"]))
    E(Entity("Main:Microsoft Office", [("ms office", 40), ("microsoft office", 60)],
             ["Category:Office software", "Category:Software"]))

    # --- computing (win32 / fpga case) ----------------------------------------
    E(Entity("Main:Microsoft Windows", [("win32", 30), ("windows", 200)],
             ["Category:Operating systems", "Category:Computing"]))
    E(Entity("Main:Codec", [("codec", 40), ("video codec", 30)],
             ["Category:Data compression", "Category:Computing"]))
    E(Entity("Main:Field-programmable gate array", [("fpga", 30)],
             ["Category:Integrated circuits", "Category:Computing",
              "Category:Computer hardware"]))
    E(Entity("Main:Computing platform", [("platform", 150)],
             ["Category:Computing"]))
    E(Entity("Main:Platform game", [("platform", 40)],
             ["Category:Video game genres"]))
    E(Entity("Main:Hardware acceleration", [("hardware acceleration", 25)],
             ["Category:Computer hardware", "Category:Computing"]))
    # the reference's Wikipedia anchor statistics give 'video' and
    # 'integration' standalone hardware senses (shortPhrases.xml:117,121
    # expects Video card / Integrated circuit for the win32 case) —
    # mirrored so sp10 asserts the reference list verbatim
    E(Entity("Main:Video card", [("video", 30)],
             ["Category:Computer hardware", "Category:Computing"]))
    E(Entity("Main:Integrated circuit", [("integration", 25)],
             ["Category:Integrated circuits", "Category:Computer hardware"]))
    E(Entity("Main:Computer hardware", [("hardware", 80)],
             ["Category:Computer hardware", "Category:Computing"]))

    # --- communication ---------------------------------------------------------
    E(Entity("Main:Email", [("email", 50)],
             ["Category:Internet services", "Category:Communication"]))
    E(Entity("Main:Mobile phone", [("mobile phone", 60)],
             ["Category:Telecommunications", "Category:Communication"]))
    E(Entity("Main:Telephone", [("phone", 80), ("telephone", 60)],
             ["Category:Telecommunications"]))
    E(Entity("Main:Website", [("website", 50)],
             ["Category:Internet services", "Category:Communication"]))

    # --- beverages / crops ------------------------------------------------------
    E(Entity("Main:Coffee", [("coffee", 200), ("java", 40)],
             ["Category:Beverages", "Category:Crops"]))
    E(Entity("Main:Tea", [("tea", 180)], ["Category:Beverages", "Category:Crops"]))
    E(Entity("Main:Cereal", [("cereal", 60)],
             ["Category:Cereals", "Category:Staple foods"]))
    E(Entity("Main:Maize", [("maize", 50)],
             ["Category:Cereals", "Category:Staple foods"]))
    E(Entity("Main:Barley", [("barley", 50)],
             ["Category:Cereals", "Category:Staple foods"]))

    # --- opera -------------------------------------------------------------------
    E(Entity("Main:La Scala", [("la scala", 50)],
             ["Category:Opera houses", "Category:Opera", "Main:Milan"]))
    E(Entity("Main:Royal Opera House",
             [("royal opera house", 60), ("covent garden", 80)],
             ["Category:Opera houses", "Category:Opera", "Main:Covent Garden"]))
    E(Entity("Main:Covent Garden", [("covent garden", 200)],
             ["Category:Districts of London", "Main:London"]))
    E(Entity("Main:Giacomo Puccini", [("puccini", 70), ("giacomo puccini", 50)],
             ["Category:Opera composers", "Category:Opera", "Main:Tosca"]))
    E(Entity("Main:Tosca", [("tosca", 40)],
             ["Category:Operas", "Category:Opera", "Main:Giacomo Puccini"]))

    # --- bioinformatics ------------------------------------------------------------
    E(Entity("Main:Smith–Waterman algorithm",
             [("smith waterman", 30), ("smith waterman algorithm", 20)],
             ["Category:Bioinformatics", "Main:Bioinformatics"]))
    E(Entity("Main:DNA sequencing", [("dna sequencing", 50)],
             ["Category:Bioinformatics", "Category:Genetics",
              "Main:Bioinformatics"]))
    E(Entity("Main:Bioinformatics", [("bioinformatics", 60)],
             ["Category:Bioinformatics", "Category:Genetics"]))
    E(Entity("Main:Will Smith", [("smith", 150)], ["Category:American actors"]))
    E(Entity("Main:Waterman pens", [("waterman", 40)],
             ["Category:Pen manufacturers"]))

    # --- environment / economics -----------------------------------------------------
    E(Entity("Main:Natural environment",
             [("environment", 150), ("environmental", 60),
              ("natural environment", 60)],
             ["Category:Environment", "Main:Natural resource"]))
    E(Entity("Main:Environmental economics",
             [("environmental economics", 50), ("environmental", 50)],
             ["Category:Economics", "Category:Environmental social science",
              "Main:Natural resource economics"]))
    E(Entity("Main:Natural resource",
             [("resource", 80), ("natural resource", 70), ("resources", 60)],
             ["Category:Environment", "Main:Natural environment"]))
    E(Entity("Main:Resource", [("resource", 80)], ["Category:Concepts"]))
    E(Entity("Main:Natural resource economics", [("resource economics", 40)],
             ["Category:Economics", "Category:Environmental social science",
              "Main:Environmental economics", "Main:Natural resource"]))
    E(Entity("Main:Economics", [("economics", 200)],
             ["Category:Social sciences", "Category:Economics"]))
    # low-prior 'economics' sense reachable only through wellbeing
    # coherence — the reference model's shape behind shortPhrases.xml:201
    # expecting Economic sociology for sp20's 'economics' mention
    E(Entity("Main:Economic sociology", [("economics", 40)],
             ["Category:Social concepts", "Main:Quality of life"]))
    E(Entity("Main:Environmental quality", [("environmental quality", 20)],
             ["Category:Environment", "Main:Quality of life"]))
    E(Entity("Main:Quality", [("quality", 60)], ["Category:Concepts"]))
    E(Entity("Main:Quality of life",
             [("wellbeing", 40), ("subjective wellbeing", 25),
              ("quality of life", 60)],
             ["Category:Social concepts", "Main:Happiness"]))
    E(Entity("Main:Happiness", [("happiness", 60)],
             ["Category:Emotions", "Main:Quality of life"]))

    # --- gis ---------------------------------------------------------------------------
    E(Entity("Main:Geographic information system", [("gis", 60)],
             ["Category:Geographic data", "Category:Spatial data analysis"]))
    E(Entity("Main:Spatial analysis", [("spatial analysis", 40)],
             ["Category:Spatial data analysis",
              "Main:Geographic information system"]))
    E(Entity("Main:Spatial econometrics", [("spatial econometrics", 20)],
             ["Category:Spatial data analysis", "Category:Economics",
              "Main:Spatial analysis"]))

    # --- misc (maps, cars, physics, northern ireland) -----------------------------------
    E(Entity("Main:Map", [("mapping", 30), ("map", 100)], ["Category:Cartography"]))
    E(Entity("Main:Spacetime", [("space and time", 20), ("spacetime", 40)],
             ["Category:Concepts in physics"]))
    E(Entity("Main:Outer space", [("space", 120)], ["Category:Astronomy"]))
    E(Entity("Main:Time", [("time", 150)], ["Category:Philosophy of time"]))
    E(Entity("Main:Nissan Motors", [("nissan", 100), ("nissans", 30)],
             ["Category:Car manufacturers", "Main:Nissan Leaf"]))
    E(Entity("Main:Nissan Leaf", [("nissan leaf", 30), ("leaf", 40)],
             ["Category:Electric cars", "Main:Nissan Motors",
              "Main:Electric car"]))
    E(Entity("Main:Leaf", [("leaf", 250)], ["Category:Plant morphology"]))
    E(Entity("Main:Electric car", [("electric car", 50)],
             ["Category:Electric cars", "Category:Automobiles"]))
    E(Entity("Main:Infrared", [("infra red", 30), ("infrared", 60)],
             ["Category:Electromagnetic spectrum",
              "Main:Electromagnetic radiation"]))
    E(Entity("Main:Electromagnetic radiation", [("radiation", 80)],
             ["Category:Electromagnetic spectrum"]))
    E(Entity("Main:Radiation", [("radiation", 120)],
             ["Category:Physical phenomena"]))
    E(Entity("Main:Gerry Adams", [("gerry adams", 40)],
             ["Category:Irish republicans", "Main:The Troubles"]))
    E(Entity("Main:The Troubles", [("troubles", 30), ("the troubles", 50)],
             ["Category:The Troubles",
              "Category:History of Northern Ireland"]))
    E(Entity("Main:Bloody Sunday (1972)", [("bloody sunday", 60)],
             ["Category:The Troubles",
              "Category:History of Northern Ireland"]))
    E(Entity("Main:Bloody Sunday (1905)", [("bloody sunday", 40)],
             ["Category:Russian Revolution"]))
    E(Entity("Main:Political party", [("party", 100)], ["Category:Politics"]))

    # redirect exercised by the corpus: Gene sequencing -> DNA sequencing
    kb.redirects.append(("Main:Gene sequencing", "Main:DNA sequencing"))
    kb.extra_surface_forms.append(("gene sequencing", "Main:Gene sequencing", 25))
    return kb


# ---------------------------------------------------------------------------
# the 35 enabled cases (same order as shortPhrases.xml)
# ---------------------------------------------------------------------------
CASES: list[dict] = [
    dict(id="sp01", phrase="smith waterman gene sequencing bioinformatics",
         expected=["Main:Smith–Waterman algorithm", "Main:DNA sequencing",
                   "Main:Bioinformatics"]),
    dict(id="sp02",
         phrase="george bush john major prime minister invasion of kuwait",
         expected=["Main:George H. W. Bush", "Main:John Major",
                   "Main:Prime Minister of the United Kingdom", "Main:Gulf War"]),
    dict(id="sp03", phrase="rice imperial college cambridge oxford yale harvard ",
         expected=["Main:Rice University", "Main:Imperial College London",
                   "Main:University of Cambridge", "Main:University of Oxford",
                   "Main:Yale University", "Main:Harvard University"]),
    dict(id="sp04", phrase="rice cheney george bush rumsfeld republican",
         expected=["Main:Condoleezza Rice", "Main:Dick Cheney",
                   "Main:George W. Bush", "Main:Donald Rumsfeld",
                   "Main:Republican Party (United States)"]),
    dict(id="sp05", phrase="java coffee tea",
         expected=["Main:Coffee", "Main:Tea"]),
    dict(id="sp06", phrase="la scala covent garden puccini tosca",
         expected=["Main:La Scala", "Main:Royal Opera House",
                   "Main:Giacomo Puccini", "Main:Tosca"]),
    dict(id="sp07", phrase="cambridge united kingdom",
         expected=["Main:Cambridge", "Main:United Kingdom"]),
    dict(id="sp08",
         phrase="university of cambridge kings college ba archaeology anthropology",
         expected=["Main:University of Cambridge",
                   "Main:King's College, Cambridge", "Main:Bachelor of Arts",
                   "Main:Archaeology", "Main:Anthropology"]),
    dict(id="sp09",
         phrase="substantial experience producing academic documents with latex "
                "lyx and designing attractive documents for print with adobe "
                "indesign and photoshop highly proficient with ms office "
                "applications",
         expected=["Main:LaTeX", "Main:LyX", "Main:Printing",
                   "Main:Adobe InDesign", "Main:Adobe Photoshop",
                   "Main:Microsoft Office"]),
    dict(id="sp10",
         phrase="an existing win32-based video codec to the fpga platform "
                "including code optimisation and creation and integration of "
                "custom hardware acceleration",
         expected=["Main:Microsoft Windows", "Main:Video card", "Main:Codec",
                   "Main:Field-programmable gate array", "Main:Computing platform",
                   "Main:Integrated circuit", "Main:Hardware acceleration"],
         reference_expected=["Main:Microsoft Windows", "Main:Video card",
                             "Main:Codec", "Main:Field-programmable gate array",
                             "Main:Platform game", "Main:Integrated circuit",
                             "Main:Hardware acceleration"],
         waived={"Platform game": "the reference file itself marks this topic "
                                  "'Wrong. But not that important atm' "
                                  "(shortPhrases.xml:120); asserted under the "
                                  "corrected expectation Computing platform"}),
    dict(id="sp11", phrase="stata and r and",
         expected=["Main:Stata", "Main:R (programming language)"]),
    dict(id="sp12",
         phrase="expertise in statistical packages including stata and r and "
                "econometric methods",
         expected=["Main:Stata", "Main:R (programming language)",
                   "Main:Econometrics"]),
    dict(id="sp13", phrase="cambridge university united kingdom",
         expected=["Main:University of Cambridge", "Main:United Kingdom"]),
    dict(id="sp14", phrase="education london school of economics",
         expected=["Main:Education", "Main:London School of Economics"]),
    dict(id="sp15",
         phrase="education london school of economics political science "
                "university of london",
         expected=["Main:Education", "Main:London School of Economics",
                   "Main:Political science", "Main:University of London"]),
    dict(id="sp16",
         phrase="gis spatial analysis and visualisation and spatial econometrics",
         expected=["Main:Geographic information system", "Main:Spatial analysis",
                   "Main:Spatial econometrics"]),
    dict(id="sp17", phrase="world congress of environmental resource economists",
         expected=["Main:Natural environment", "Main:Natural resource"]),
    dict(id="sp18", phrase="world congress of environmental resource economics",
         expected=["Main:Environmental economics",
                   "Main:Natural resource economics"]),
    dict(id="sp19",
         phrase="mapping happiness across space and time. a study of subjective "
                "wellbeing",
         expected=["Main:Map", "Main:Happiness", "Main:Spacetime",
                   "Main:Quality of life"]),
    dict(id="sp20", phrase="environmental quality wellbeing economics",
         expected=["Main:Environmental quality", "Main:Quality of life",
                   "Main:Economic sociology"]),
    dict(id="sp21", phrase="email mobile phone website",
         expected=["Main:Email", "Main:Mobile phone", "Main:Website"]),
    dict(id="sp22", phrase="r stata",
         expected=["Main:R (programming language)", "Main:Stata"]),
    dict(id="sp23", phrase="statistics stata r",
         expected=["Main:Statistics", "Main:Stata",
                   "Main:R (programming language)"]),
    dict(id="sp24", phrase="python palin",
         expected=["Main:Monty Python", "Main:Michael Palin"]),
    dict(id="sp25", phrase="tea party palin",
         expected=["Main:Tea Party movement", "Main:Sarah Palin"]),
    dict(id="sp26", phrase="cereal maize barley rice",
         expected=["Main:Cereal", "Main:Maize", "Main:Barley", "Main:Rice"]),
    dict(id="sp27", phrase="objective caml, haskell",
         expected=["Main:Objective Caml", "Main:Haskell (programming language)"]),
    dict(id="sp28", phrase="smith waterman gene sequencing",
         expected=["Main:Smith–Waterman algorithm", "Main:DNA sequencing"],
         reference_expected=["Main:Smith–Waterman algorithm",
                             "Main:Gene sequencing"],
         waived={"Gene sequencing": "redirect of DNA sequencing; dictionary "
                                    "resolves redirects at build time (A8) — "
                                    "machine-checked: reference_expected maps "
                                    "onto expected through the built redirect "
                                    "table (test_reference_expectations_"
                                    "canonicalize)"}),
    dict(id="sp29", phrase="cheney bush rumsfeld",
         expected=["Main:Dick Cheney", "Main:George W. Bush",
                   "Main:Donald Rumsfeld"]),
    dict(id="sp30", phrase="java c design patterns",
         expected=["Main:Java (programming language)", "Main:C++",
                   "Main:Design pattern (computer science)"]),
    dict(id="sp31", phrase="the leaf, nissan's new electric car",
         expected=["Main:Nissan Leaf", "Main:Nissan Motors", "Main:Electric car"]),
    dict(id="sp32", phrase="university of cambridge united kingdom",
         expected=["Main:University of Cambridge", "Main:United Kingdom"]),
    dict(id="sp33", phrase="hills road sixth form college cambridge",
         expected=["Main:Hills Road Sixth Form College", "Main:Cambridge"]),
    dict(id="sp34", phrase="infra red background radiation",
         expected=["Main:Infrared", "Main:Electromagnetic radiation"]),
    dict(id="sp35", phrase="gerry adams troubles bloody sunday",
         expected=["Main:Gerry Adams", "Main:The Troubles",
                   "Main:Bloody Sunday (1972)"]),
]
