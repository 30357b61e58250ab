"""Embedded, deterministic phrase banks.

Used (a) to build the hashed char-trigram language-ID and perplexity
artifacts (fastText-lid / KenLM stand-ins — no downloads allowed in this
environment) and (b) by the synthetic transcripts generator. Everything is a
literal: no wall-clock, no randomness, no external data.
"""

from __future__ import annotations

EN_SENTENCES = (
    "The committee reviewed the proposal and agreed to fund the project for another year.",
    "She walked along the river in the early morning while the city was still quiet.",
    "Our team shipped the new release after weeks of careful testing and code review.",
    "The recipe calls for two cups of flour, a pinch of salt, and a little patience.",
    "He explained the algorithm step by step until everyone in the room understood it.",
    "The weather forecast predicts light rain in the afternoon and clear skies tonight.",
    "We should schedule the meeting for Thursday so that the whole group can attend.",
    "The museum opened a new exhibit about the history of printing and early books.",
    "A good night of sleep makes a remarkable difference in how well you can focus.",
    "The garden needs watering every other day during the hottest weeks of summer.",
    "They discussed the budget at length before deciding to postpone the decision.",
    "The train arrived ten minutes late, but we still made the connection easily.",
    "Reading a little every evening is the simplest way to build a lasting habit.",
    "The engineers traced the outage to a misconfigured cache in the login service.",
    "Her presentation covered the quarterly results and the plan for the next year.",
    "The children played in the park until the sun went down behind the hills.",
    "Please remember to submit the report by Friday and include the updated figures.",
    "The orchestra rehearsed the symphony twice before the conductor was satisfied.",
    "I think the second draft is much clearer, though the ending still needs work.",
    "The store on the corner sells fresh bread every morning except on Sundays.",
    "Learning a new language takes time, but daily practice makes it manageable.",
    "The research paper describes a method for measuring soil moisture from space.",
    "After the storm passed, the neighbors helped each other clear the fallen branches.",
    "The customer asked whether the warranty covers accidental damage to the screen.",
    "We compared three vendors on price, support quality, and delivery timelines.",
    "The hiking trail climbs gently through the forest before reaching the ridge.",
    "His latest novel explores the friendship between two families over three decades.",
    "The nurse checked the patient's temperature and noted it carefully in the chart.",
    "Turn left at the second light and the library will be on your right side.",
    "The workshop taught us how to compost kitchen scraps and reduce household waste.",
    "Prices rose slowly through the spring and then leveled off during the summer.",
    "The documentary follows a group of volunteers restoring an old wooden sailboat.",
)

ES_SENTENCES = (
    "El comité revisó la propuesta y acordó financiar el proyecto durante otro año.",
    "Ella caminó junto al río por la mañana mientras la ciudad seguía tranquila.",
    "La receta lleva dos tazas de harina, una pizca de sal y un poco de paciencia.",
    "El pronóstico anuncia lluvia ligera por la tarde y cielos despejados esta noche.",
    "Deberíamos programar la reunión para el jueves para que todo el grupo pueda asistir.",
    "El museo abrió una nueva exposición sobre la historia de la imprenta.",
    "Dormir bien por la noche marca una diferencia notable en la concentración.",
    "El jardín necesita riego cada dos días durante las semanas más calurosas del verano.",
    "Discutieron el presupuesto largamente antes de decidir aplazar la decisión.",
    "El tren llegó diez minutos tarde, pero aun así alcanzamos la conexión fácilmente.",
    "Leer un poco cada noche es la manera más sencilla de crear un hábito duradero.",
    "Los niños jugaron en el parque hasta que el sol se escondió detrás de las colinas.",
    "Por favor recuerda entregar el informe el viernes con las cifras actualizadas.",
    "La tienda de la esquina vende pan fresco todas las mañanas excepto los domingos.",
    "Aprender un idioma nuevo lleva tiempo, pero la práctica diaria lo hace posible.",
    "Después de la tormenta, los vecinos ayudaron a retirar las ramas caídas.",
)

FR_SENTENCES = (
    "Le comité a examiné la proposition et a accepté de financer le projet un an de plus.",
    "Elle a marché le long de la rivière tôt le matin pendant que la ville dormait encore.",
    "La recette demande deux tasses de farine, une pincée de sel et un peu de patience.",
    "La météo prévoit une pluie légère cet après-midi et un ciel dégagé ce soir.",
    "Nous devrions fixer la réunion à jeudi pour que tout le groupe puisse venir.",
    "Le musée a ouvert une nouvelle exposition sur l'histoire de l'imprimerie.",
    "Une bonne nuit de sommeil change beaucoup la capacité de concentration.",
    "Le jardin doit être arrosé tous les deux jours pendant les semaines les plus chaudes.",
    "Ils ont longuement discuté du budget avant de décider de reporter la décision.",
    "Le train est arrivé avec dix minutes de retard, mais nous avons eu la correspondance.",
    "Lire un peu chaque soir est le moyen le plus simple de créer une habitude durable.",
    "Les enfants ont joué dans le parc jusqu'à ce que le soleil disparaisse derrière les collines.",
    "N'oublie pas de rendre le rapport vendredi avec les chiffres mis à jour.",
    "La boulangerie du coin vend du pain frais tous les matins sauf le dimanche.",
    "Apprendre une nouvelle langue prend du temps, mais la pratique quotidienne aide beaucoup.",
    "Après l'orage, les voisins se sont entraidés pour dégager les branches tombées.",
)

DE_SENTENCES = (
    "Der Ausschuss prüfte den Vorschlag und beschloss, das Projekt ein weiteres Jahr zu fördern.",
    "Sie ging früh am Morgen am Fluss entlang, während die Stadt noch ruhig war.",
    "Das Rezept verlangt zwei Tassen Mehl, eine Prise Salz und ein wenig Geduld.",
    "Die Wettervorhersage meldet leichten Regen am Nachmittag und klaren Himmel am Abend.",
    "Wir sollten das Treffen auf Donnerstag legen, damit die ganze Gruppe teilnehmen kann.",
    "Das Museum eröffnete eine neue Ausstellung über die Geschichte des Buchdrucks.",
    "Eine gute Nacht Schlaf macht einen erstaunlichen Unterschied für die Konzentration.",
    "Der Garten muss in den heißesten Wochen des Sommers jeden zweiten Tag gegossen werden.",
    "Sie besprachen das Budget ausführlich, bevor sie die Entscheidung verschoben.",
    "Der Zug kam zehn Minuten zu spät, aber wir erreichten den Anschluss trotzdem.",
    "Jeden Abend ein wenig zu lesen ist der einfachste Weg zu einer dauerhaften Gewohnheit.",
    "Die Kinder spielten im Park, bis die Sonne hinter den Hügeln verschwand.",
    "Bitte denk daran, den Bericht am Freitag mit den aktualisierten Zahlen abzugeben.",
    "Der Laden an der Ecke verkauft jeden Morgen frisches Brot, außer sonntags.",
    "Eine neue Sprache zu lernen braucht Zeit, aber tägliche Übung macht es machbar.",
    "Nach dem Sturm halfen die Nachbarn einander, die umgestürzten Äste wegzuräumen.",
)

IT_SENTENCES = (
    "Il comitato ha esaminato la proposta e ha deciso di finanziare il progetto per un altro anno.",
    "Lei camminava lungo il fiume la mattina presto mentre la città era ancora tranquilla.",
    "La ricetta richiede due tazze di farina, un pizzico di sale e un po' di pazienza.",
    "Le previsioni annunciano pioggia leggera nel pomeriggio e cielo sereno stasera.",
    "Dovremmo fissare la riunione per giovedì così tutto il gruppo potrà partecipare.",
    "Il museo ha aperto una nuova mostra sulla storia della stampa e dei libri antichi.",
    "Una buona notte di sonno fa una differenza notevole nella concentrazione.",
    "Il giardino va annaffiato un giorno sì e uno no nelle settimane più calde dell'estate.",
    "Hanno discusso a lungo del bilancio prima di decidere di rinviare la decisione.",
    "Il treno è arrivato con dieci minuti di ritardo, ma abbiamo preso la coincidenza.",
    "Leggere un po' ogni sera è il modo più semplice per costruire un'abitudine duratura.",
    "I bambini hanno giocato nel parco finché il sole non è tramontato dietro le colline.",
    "Per favore ricordati di consegnare la relazione venerdì con i dati aggiornati.",
    "Il negozio all'angolo vende pane fresco ogni mattina tranne la domenica.",
    "Imparare una lingua nuova richiede tempo, ma la pratica quotidiana aiuta molto.",
    "Dopo il temporale, i vicini si sono aiutati a togliere i rami caduti.",
)

LANG_SENTENCES = {
    "en": EN_SENTENCES,
    "es": ES_SENTENCES,
    "fr": FR_SENTENCES,
    "de": DE_SENTENCES,
    "it": IT_SENTENCES,
}
