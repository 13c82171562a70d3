"""The embedded char-n-gram LID model (P8): per-language detection,
script-block tier, the zz fallback, and the pipeline zh collapse.

Reference behavior modeled: fasttext lid.176 batched over 300-char
prepped prefixes, zh-* → zh collapse, 'zz' failure code
(google.py:90-161,241-243; apple.py:469-487)."""

from adscrawler_spark.functions import langmodel as lm

SNIPPETS = {
    "en": "This is the description of the app and it is in English "
          "with many of the most common words that you would expect",
    "es": "Esta es la descripción de la aplicación y es en español "
          "con muchas de las palabras más comunes que se esperan",
    "fr": "Retrouvez vos émissions préférées et regardez des vidéos "
          "en direct sur votre téléphone où que vous soyez",
    "de": "Mit dieser Anwendung kannst du deine Fotos bearbeiten und "
          "mit deinen Freunden teilen, ganz einfach und schnell",
    "pt": "Converse com seus amigos, compartilhe fotos e vídeos e "
          "fique por dentro de tudo o que acontece perto de você",
    "it": "Gioca ai migliori giochi di parole e sfida i tuoi amici "
          "con questa applicazione semplice e divertente",
    "nl": "Met deze app kun je eenvoudig je foto's bewerken en delen "
          "met je vrienden, waar je ook bent",
}

SCRIPTS = {
    "zh-cn": "这是一个中文应用的描述 它包含很多中文字符 用于测试语言检测",
    "ja": "これは日本語のアプリの説明です とても便利なアプリです",
    "ko": "이것은 한국어 앱 설명입니다 매우 유용한 앱입니다",
    "ru": "Это приложение помогает вам находить новые игры и музыку",
    "ar": "هذا التطبيق يساعدك على اكتشاف ألعاب وموسيقى جديدة",
    "el": "Αυτή η εφαρμογή σας βοηθά να ανακαλύψετε νέα παιχνίδια",
    "he": "אפליקציה זו עוזרת לך לגלות משחקים ומוזיקה חדשים",
    "th": "แอปนี้ช่วยให้คุณค้นพบเกมและเพลงใหม่",
    "hi": "यह ऐप आपको नए गेम और संगीत खोजने में मदद करता है",
}


def test_latin_languages_classify():
    for lang, txt in SNIPPETS.items():
        assert lm.detect(lm.prep_snippet(txt)) == lang, lang


def test_script_block_languages():
    for lang, txt in SCRIPTS.items():
        assert lm.detect(lm.prep_snippet(txt)) == lang, lang


def test_gibberish_and_short_noise_fall_back_to_zz():
    for txt in ["qzx vbnk wrtp mlkj dfgh",
                "lorem zapo trukli vandemoor quixet blarnop sedufi",
                "ok", "xjq wvzk pfmt", "12345 67890", "!!! ???"]:
        assert lm.detect(lm.prep_snippet(txt)) == "zz", txt


def test_empty_and_none_are_zz():
    assert lm.detect("") == "zz"
    assert lm.detect(lm.prep_snippet(None)) == "zz"


def test_prep_snippet_prefix_and_whitespace():
    assert lm.prep_snippet("  a\t\nb   c  ") == "a b c"
    assert len(lm.prep_snippet("x" * 1000)) == 300


def test_zh_cn_exercises_pipeline_collapse():
    # the model reports the regioned code; the pipeline collapses
    # zh-* → zh (google.py:241-243) — keep that contract testable
    assert lm.detect(SCRIPTS["zh-cn"]).startswith("zh-")


def test_profiles_are_deterministic():
    # ranked profiles must not depend on dict/hash order
    p1 = lm._profile(lm._SEEDS["en"])
    p2 = lm._profile(lm._SEEDS["en"])
    assert p1 == p2
    assert len(p1) == lm.PROFILE_SIZE


def test_distance_gate_separation():
    """The calibration the MAX_NORM_DISTANCE gate rests on: every
    in-register snippet scores comfortably below the gate, every
    gibberish probe comfortably above it."""
    def best_norm(txt):
        tp = lm._profile(txt)
        denom = len(tp) * lm.PROFILE_SIZE
        return min(
            lm._distance(tp, p) / denom for p in lm._PROFILES.values()
        )

    for txt in SNIPPETS.values():
        assert best_norm(lm.prep_snippet(txt)) <= 0.70, txt
    for txt in ["qzx vbnk wrtp mlkj dfgh", "xjq wvzk pfmt"]:
        assert best_norm(txt) >= 0.78, txt
