"""Tiny in-repo seed corpora for the deterministic char-ngram models.

The reference loads external model artifacts (gridded first-guess fields,
reference: functions/IO/read_fgs.r:78-110); this sandbox has no network, so
the langid profiles and the KenLM-style character LM are trained at import
time from these embedded paragraphs. They are original generic sentences —
enough signal for byte-trigram language discrimination and for separating
templated English from planted gibberish, which is all the synthetic
conformance corpus (FIXTURES.md §2) requires.
"""

SEED_CORPORA: dict[str, str] = {
    "en": (
        "The quick brown fox jumps over the lazy dog while the sun sets "
        "behind the quiet hills. Every morning the children walk to school "
        "along the river and talk about the stories they have read. "
        "Science and engineering depend on careful measurement, repeated "
        "experiments, and honest reporting of results. The weather today "
        "is mild with a light wind from the north and scattered clouds. "
        "Please remember to close the window before you leave the house. "
        "A good system design keeps the simple case fast and the hard "
        "case possible. Data pipelines should stream records in batches "
        "and avoid loading everything into memory at once. The committee "
        "will meet on Thursday to discuss the budget for the next year. "
        "Thank you for your help with the project, it made a difference. "
        "Could you explain how the algorithm handles duplicate entries? "
        "The model returns a score between zero and one for each input. "
        "It was the best of times, and the roads were wet after the rain. "
        "I would like to order a coffee and a slice of bread with butter. "
        "History teaches that small changes can have large consequences."
    ),
    "de": (
        "Der schnelle braune Fuchs springt über den faulen Hund, während "
        "die Sonne hinter den stillen Hügeln untergeht. Jeden Morgen gehen "
        "die Kinder am Fluss entlang zur Schule und sprechen über die "
        "Geschichten, die sie gelesen haben. Wissenschaft und Technik "
        "beruhen auf sorgfältigen Messungen und ehrlichen Berichten. Das "
        "Wetter ist heute mild mit leichtem Wind aus dem Norden. Bitte "
        "denken Sie daran, das Fenster zu schließen, bevor Sie das Haus "
        "verlassen. Ein gutes System hält den einfachen Fall schnell und "
        "den schweren Fall möglich. Vielen Dank für Ihre Hilfe bei dem "
        "Projekt, sie hat einen Unterschied gemacht. Können Sie erklären, "
        "wie der Algorithmus mit doppelten Einträgen umgeht? Ich möchte "
        "einen Kaffee und eine Scheibe Brot mit Butter bestellen."
    ),
    "fr": (
        "Le rapide renard brun saute par-dessus le chien paresseux pendant "
        "que le soleil se couche derrière les collines tranquilles. Chaque "
        "matin, les enfants marchent vers l'école le long de la rivière et "
        "parlent des histoires qu'ils ont lues. La science et l'ingénierie "
        "reposent sur des mesures soignées et des rapports honnêtes. Le "
        "temps est doux aujourd'hui avec un vent léger du nord. Veuillez "
        "fermer la fenêtre avant de quitter la maison. Merci pour votre "
        "aide sur le projet, cela a fait une différence. Pouvez-vous "
        "expliquer comment l'algorithme traite les entrées en double ? "
        "Je voudrais commander un café et une tranche de pain avec du "
        "beurre. L'histoire montre que de petits changements peuvent "
        "avoir de grandes conséquences."
    ),
    "es": (
        "El rápido zorro marrón salta sobre el perro perezoso mientras el "
        "sol se pone detrás de las colinas tranquilas. Cada mañana los "
        "niños caminan a la escuela junto al río y hablan de las historias "
        "que han leído. La ciencia y la ingeniería dependen de mediciones "
        "cuidadosas y de informes honestos. El tiempo hoy es templado con "
        "un viento ligero del norte. Por favor, recuerda cerrar la ventana "
        "antes de salir de la casa. Gracias por tu ayuda con el proyecto, "
        "marcó una diferencia. ¿Puedes explicar cómo el algoritmo maneja "
        "las entradas duplicadas? Me gustaría pedir un café y una rebanada "
        "de pan con mantequilla. La historia enseña que pequeños cambios "
        "pueden tener grandes consecuencias."
    ),
    "it": (
        "La veloce volpe marrone salta sopra il cane pigro mentre il sole "
        "tramonta dietro le colline tranquille. Ogni mattina i bambini "
        "camminano verso la scuola lungo il fiume e parlano delle storie "
        "che hanno letto. La scienza e l'ingegneria dipendono da misure "
        "accurate e da rapporti onesti. Il tempo oggi è mite con un vento "
        "leggero da nord. Per favore ricordati di chiudere la finestra "
        "prima di uscire di casa. Grazie per il tuo aiuto con il progetto, "
        "ha fatto la differenza. Puoi spiegare come l'algoritmo gestisce "
        "le voci duplicate? Vorrei ordinare un caffè e una fetta di pane "
        "con il burro. La storia insegna che piccoli cambiamenti possono "
        "avere grandi conseguenze."
    ),
    "pt": (
        "A rápida raposa marrom pula sobre o cão preguiçoso enquanto o sol "
        "se põe atrás das colinas tranquilas. Toda manhã as crianças "
        "caminham para a escola ao longo do rio e falam sobre as histórias "
        "que leram. A ciência e a engenharia dependem de medições "
        "cuidadosas e de relatórios honestos. O tempo hoje está ameno com "
        "um vento leve do norte. Por favor, lembre-se de fechar a janela "
        "antes de sair de casa. Obrigado pela sua ajuda com o projeto, fez "
        "uma diferença. Você pode explicar como o algoritmo lida com "
        "entradas duplicadas? Eu gostaria de pedir um café e uma fatia de "
        "pão com manteiga. A história ensina que pequenas mudanças podem "
        "ter grandes consequências."
    ),
    "nl": (
        "De snelle bruine vos springt over de luie hond terwijl de zon "
        "achter de stille heuvels ondergaat. Elke ochtend lopen de "
        "kinderen langs de rivier naar school en praten over de verhalen "
        "die ze hebben gelezen. Wetenschap en techniek zijn afhankelijk "
        "van zorgvuldige metingen en eerlijke verslagen. Het weer is "
        "vandaag zacht met een lichte wind uit het noorden. Vergeet niet "
        "het raam te sluiten voordat je het huis verlaat. Bedankt voor je "
        "hulp bij het project, het maakte een verschil. Kun je uitleggen "
        "hoe het algoritme met dubbele invoer omgaat? Ik wil graag een "
        "koffie bestellen en een snee brood met boter."
    ),
    "ru": (
        "Быстрая коричневая лиса прыгает через ленивую собаку, пока солнце "
        "садится за тихими холмами. Каждое утро дети идут в школу вдоль "
        "реки и говорят об историях, которые они прочитали. Наука и "
        "техника зависят от точных измерений и честных отчетов. Погода "
        "сегодня мягкая, с легким ветром с севера. Пожалуйста, не забудьте "
        "закрыть окно, прежде чем выйти из дома. Спасибо за вашу помощь с "
        "проектом, это имело значение. Можете объяснить, как алгоритм "
        "обрабатывает повторяющиеся записи? Я хотел бы заказать кофе и "
        "кусок хлеба с маслом."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒惰的狗，太阳在安静的山丘后面落下。每天早上，孩子们沿着"
        "河边走路上学，谈论他们读过的故事。科学和工程依赖于仔细的测量和诚实的报告。"
        "今天天气温和，北风轻拂，云层稀疏。请记得在离开家之前关上窗户。谢谢你对这个"
        "项目的帮助，它带来了变化。你能解释一下算法如何处理重复的条目吗？我想点一杯"
        "咖啡和一片涂黄油的面包。历史告诉我们，小的变化可能产生大的后果。"
    ),
}
