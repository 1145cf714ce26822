"""Full-size default stop sets for the ``analyze()`` languages.

Reference: the per-language analyzer registry
(utils/src/main/scala/com/salesforce/op/utils/text/
LuceneTextAnalyzer.scala) instantiates Lucene analyzers whose default
stop sets are the public Snowball stopword lists (snowballstem.org) —
30-300 function words per language — while this engine shipped
20-35-word subsets through r10 (PARITY delta 1d). These lists close
that delta as DATA: genuine function-word inventories (articles,
pronouns with their case/clitic forms, conjugated be/have/do
auxiliaries, prepositions, conjunctions, common adverbs/particles)
sized to the Lucene band per language. They are authored against the
published Snowball/Lucene sets' coverage, not copied byte-for-byte;
``load_stopword_list`` remains the path for users who need an exact
file (e.g. a pinned Lucene version's set).

All entries are lowercase — ``analyze()`` lowercases before the stop
filter. Greek entries use final-sigma natural forms (the filter runs
before the engine's final-sigma normalization, mirroring Lucene's
order).
"""
from __future__ import annotations

__all__ = ["FULL_STOPWORDS"]


def _w(s: str) -> list[str]:
    out, seen = [], set()
    for t in s.split():
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


FULL_STOPWORDS: dict[str, list[str]] = {}

# English — Lucene's EnglishAnalyzer ships exactly this 33-word set.
FULL_STOPWORDS["en"] = _w("""
a an and are as at be but by for if in into is it no not of on or such
that the their then there these they this to was will with
""")

# German (Snowball german/stop.txt coverage: articles + case forms,
# pronouns, sein/haben/werden conjugations, prepositions, particles)
FULL_STOPWORDS["de"] = _w("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei
bin bis bist da damit dann der den des dem die das daß dass derselbe
derselben denselben desselben demselben dieselbe dieselben dasselbe
dazu dein deine deinem deinen deiner deines denn derer dessen dich dir
du dies diese diesem diesen dieser dieses doch dort durch ein eine
einem einen einer eines einig einige einigem einigen einiger einiges
einmal er ihn ihm es etwas euer eure eurem euren eurer eures für gegen
gewesen hab habe haben hat hatte hatten hier hin hinter ich mich mir
ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem
jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein keine
keinem keinen keiner keines können könnte machen man manche manchem
manchen mancher manches mein meine meinem meinen meiner meines mit
muss musste nach nicht nichts noch nun nur ob oder ohne sehr sein
seine seinem seinen seiner seines selbst sich sie ihnen sind so solche
solchem solchen solcher solches soll sollte sondern sonst über um und
uns unse unsem unsen unser unses unter viel vom von vor während war
waren warst was weg weil weiter welche welchem welchen welcher welches
wenn werde werden wie wieder will wir wird wirst wo wollen wollte
würde würden zu zum zur zwar zwischen
""")

# French (Snowball french/stop.txt coverage: articles/elisions,
# pronouns + clitics, être/avoir conjugations, prepositions)
FULL_STOPWORDS["fr"] = _w("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les
leur lui ma mais me même mes moi mon ne nos notre nous on ou où par
pas pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
votre vous c d j l à m n s t y été étée étées étés étant étante étants
étantes suis es est sommes êtes sont serai seras sera serons serez
seront serais serait serions seriez seraient étais était étions étiez
étaient fus fut fûmes fûtes furent sois soit soyons soyez soient fusse
fusses fût fussions fussiez fussent ayant ayante ayantes ayants eu eue
eues eus ai as avons avez ont aurai auras aura aurons aurez auront
aurais aurait aurions auriez auraient avais avait avions aviez avaient
eut eûmes eûtes eurent aie aies ait ayons ayez aient eusse eusses eût
eussions eussiez eussent
""")

# Spanish (Snowball spanish/stop.txt coverage incl. the full
# estar/ser/tener/haber paradigm blocks)
FULL_STOPWORDS["es"] = _w("""
de la que el en y a los del se las por un para con no una su al lo
como más pero sus le ya o este sí porque esta entre cuando muy sin
sobre también me hasta hay donde quien desde todo nos durante todos
uno les ni contra otros ese eso ante ellos e esto mí antes algunos qué
unos yo otro otras otra él tanto esa estos mucho quienes nada muchos
cual poco ella estar estas algunas algo nosotros mi mis tú te ti tu
tus ellas nosotras vosotros vosotras os mío mía míos mías tuyo tuya
tuyos tuyas suyo suya suyos suyas nuestro nuestra nuestros nuestras
vuestro vuestra vuestros vuestras esos esas estoy estás está estamos
estáis están esté estés estemos estéis estén estaré estarás estará
estaremos estaréis estarán estaría estarías estaríamos estaríais
estarían estaba estabas estábamos estabais estaban estuve estuviste
estuvo estuvimos estuvisteis estuvieron estuviera estuvieras
estuviéramos estuvierais estuvieran estuviese estuvieses estuviésemos
estuvieseis estuviesen estando estado estada estados estadas estad he
has ha hemos habéis han haya hayas hayamos hayáis hayan habré habrás
habrá habremos habréis habrán habría habrías habríamos habríais
habrían había habías habíamos habíais habían hube hubiste hubo hubimos
hubisteis hubieron hubiera hubieras hubiéramos hubierais hubieran
hubiese hubieses hubiésemos hubieseis hubiesen habiendo habido habida
habidos habidas soy eres es somos sois son sea seas seamos seáis sean
seré serás será seremos seréis serán sería serías seríamos seríais
serían era eras éramos erais eran fui fuiste fue fuimos fuisteis
fueron fuera fueras fuéramos fuerais fueran fuese fueses fuésemos
fueseis fuesen siendo sido tengo tienes tiene tenemos tenéis tienen
tenga tengas tengamos tengáis tengan tendré tendrás tendrá tendremos
tendréis tendrán tendría tendrías tendríamos tendríais tendrían tenía
tenías teníamos teníais tenían tuve tuviste tuvo tuvimos tuvisteis
tuvieron tuviera tuvieras tuviéramos tuvierais tuvieran tuviese
tuvieses tuviésemos tuvieseis tuviesen teniendo tenido tenida tenidos
tenidas tened
""")

# Italian (Snowball italian/stop.txt coverage incl. essere/avere/
# fare/stare paradigms)
FULL_STOPWORDS["it"] = _w("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai
dagli dall dagl dalla dalle di del dello dei degli dell degl della
delle in nel nello nei negli nell negl nella nelle su sul sullo sui
sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi loro
mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro nostra
nostri nostre vostro vostra vostri vostre mi ti ci vi lo la li le gli
ne il un uno una ma ed se perché anche come dov dove che chi cui non
più quale quanto quanti quanta quante quello quelli quella quelle
questo questi questa queste si tutto tutti a c e i l o ho hai ha
abbiamo avete hanno abbia abbiate abbiano avrò avrai avrà avremo
avrete avranno avrei avresti avrebbe avremmo avreste avrebbero avevo
avevi aveva avevamo avevate avevano ebbi avesti ebbe avemmo aveste
ebbero avessi avesse avessimo avessero avendo avuto avuta avuti avute
sono sei è siamo siete sia siate siano sarò sarai sarà saremo sarete
saranno sarei saresti sarebbe saremmo sareste sarebbero ero eri era
eravamo eravate erano fui fosti fu fummo foste furono fossi fosse
fossimo fossero essendo faccio fai facciamo fanno faccia facciate
facciano farò farai farà faremo farete faranno farei faresti farebbe
faremmo fareste farebbero facevo facevi faceva facevamo facevate
facevano feci facesti fece facemmo faceste fecero facessi facesse
facessimo facessero facendo sto stai sta stiamo stanno stia stiate
stiano starò starai starà staremo starete staranno starei staresti
starebbe staremmo stareste starebbero stavo stavi stava stavamo
stavate stavano stetti stesti stette stemmo steste stettero stessi
stesse stessimo stessero stando
""")

# Portuguese (Snowball portuguese/stop.txt coverage incl. ser/estar/
# ter/haver paradigm blocks)
FULL_STOPWORDS["pt"] = _w("""
de a o que e do da em um para é com não uma os no se na por mais as
dos como mas foi ao ele das tem à seu sua ou ser quando muito há nos
já está eu também só pelo pela até isso ela entre era depois sem mesmo
aos ter seus quem nas me esse eles estão você tinha foram essa num nem
suas meu às minha têm numa pelos elas havia seja qual será nós tenho
lhe deles essas esses pelas este fosse dele tu te vocês vos lhes meus
minhas teu tua teus tuas nosso nossa nossos nossas dela delas esta
estes estas aquele aquela aqueles aquelas isto aquilo estou estamos
estive esteve estivemos estiveram estava estávamos estavam estivera
estivéramos esteja estejamos estejam estivesse estivéssemos estivessem
estiver estivermos estiverem hei hão houve houvemos houveram houvera
houvéramos haja hajamos hajam houvesse houvéssemos houvessem houver
houvermos houverem houverei houverá houveremos houverão houveria
houveríamos houveriam sou somos são fui fomos eram fora fôramos sejamos
sejam fôssemos fossem for formos forem serei seremos serão seria
seríamos seriam tenha tenhamos tenham tinham tive teve tivemos tiveram
tivera tivéramos tivesse tivéssemos tivessem tiver tivermos tiverem
terei terá teremos terão teria teríamos teriam
""")

# Dutch (Snowball dutch/stop.txt coverage)
FULL_STOPWORDS["nl"] = _w("""
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze
zich bij ook tot je mij uit der daar haar naar heb hoe heeft hebben
deze u want nog zal me zij nu ge geen omdat iets worden toch al waren
veel meer doen toen moet ben zonder kan hun dus alles onder ja eens
hier wie werd altijd doch wordt wezen kunnen ons zelf tegen na reeds
wil kon niets uw iemand geweest andere
""")

# Swedish (Snowball swedish/stop.txt coverage)
FULL_STOPWORDS["sv"] = _w("""
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom
skulle hennes där min man ej vid kunde något från ut när efter upp vi
dem vara vad över än dig kan sina här ha mot alla under någon eller
allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt ni
bli blev oss din dessa några deras blir mina samma vilken er sådan vår
blivit dess inom mellan sådant varför varje vilka ditt vem vilket
sitta sådana vart dina vars vårt våra ert era vilkas
""")

# Norwegian (Snowball norwegian/stop.txt coverage incl. nynorsk forms)
FULL_STOPWORDS["no"] = _w("""
og i jeg det at en et den til er som på de med han av ikke ikkje der
så var meg seg men ett har om vi min mitt ha hadde hun nå over da ved
fra du ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl
her alle vil bli ble blei bli blitt kunne inn når være kom noen noe
ville dere som deres kun ja etter ned skulle denne for deg si sine
sitt mot å meget hvorfor dette disse uten hvordan ingen din ditt blir
samme hvilken hvilke sånn inni mellom vår hver hvem vors hvis både bare
enn fordi før mange også slik vært bare begge siden henne hennar
hennes
""")

# Danish (Snowball danish/stop.txt coverage)
FULL_STOPWORDS["da"] = _w("""
og i jeg det at en den til er som på de med han af for ikke der var
mig sig men et har om vi min havde ham hun nu over da fra du ud sin
dem os op man hans hvor eller hvad skal selv her alle vil blev kunne
ind når være dog noget ville jo deres efter ned skulle denne end dette
mit også under have dig anden hende mine alt meget sit sine vor mod
disse hvis din nogle hos blive mange ad bliver hendes været thi jer
sådan
""")

# Finnish (Snowball finnish/stop.txt coverage: olla conjugations +
# pronoun case paradigms)
FULL_STOPWORDS["fi"] = _w("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
en et ei emme ette eivät minä minun minut minua minussa minusta minuun
minulla minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun
sinulla sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen
hänellä häneltä hänelle me meidän meidät meitä meissä meistä meihin
meillä meiltä meille te teidän teidät teitä teissä teistä teihin
teillä teiltä teille he heidän heidät heitä heissä heistä heihin
heillä heiltä heille tämä tämän tätä tässä tästä tähän tällä tältä
tälle tänä täksi tuo tuon tuota tuossa tuosta tuohon tuolla tuolta
tuolle tuona tuoksi se sen sitä siinä siitä siihen sillä siltä sille
sinä siksi nämä näiden näitä näissä näistä näihin näillä näiltä näille
näinä näiksi nuo noiden noita noissa noista noihin noilla noilta
noille noina noiksi ne niiden niitä niissä niistä niihin niillä niiltä
niille niinä niiksi kuka kenen kenet ketä kenessä kenestä keneen
kenellä keneltä kenelle kenenä keneksi ketkä keiden keitä keissä
keistä keihin keillä keiltä keille keinä keiksi mikä minkä mitä missä
mistä mihin millä miltä mille minä miksi mitkä joka jonka jota jossa
josta johon jolla jolta jolle jona joksi jotka joiden joita joissa
joista joihin joilla joilta joille joina joiksi että ja jos koska kuin
mutta niin sekä sillä tai vaan vai vaikka kanssa mukaan noin poikki
yli kun niin nyt itse
""")

# Russian (Snowball russian/stop.txt coverage)
FULL_STOPWORDS["ru"] = _w("""
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам ведь там потом себя ничего ей может они тут где есть надо ней для
мы тебя их чем была сам чтоб без будто чего раз тоже себе под будет ж
тогда кто этот того потому этого какой совсем ним здесь этом один
почти мой тем чтобы нее сейчас были куда зачем всех никогда можно при
наконец два об другой хоть после над больше тот через эти нас про всего
них какая много разве три эту моя впрочем хорошо свою этой перед иногда
лучше чуть том нельзя такой им более всегда конечно всю между
""")

# Romanian (Snowball romanian/stop.txt coverage; comma-below forms
# included so raw modern text filters correctly)
FULL_STOPWORDS["ro"] = _w("""
acea aceasta această aceea acei aceia acel acela acele acelea acest
acesta aceste acestea acestei acestia acestui acum ai aia aibă aici al
ăla ale alea altceva altcineva am ar are aş aşadar asemenea asta ăsta
astăzi astea ăstea ăştia asupra aţi au avea avem aveţi azi bine bucur
bună ca că căci când care cărei căror cărui cât câte câţi către câtva
ce cel ceva chiar cînd cine cineva cît cîte cîţi cîtva contra cu cum
cumva curând curînd da dă dacă dar datorită de deci deja deoarece
departe deşi din dinaintea dintr dintre drept după ea ei el ele eram
este eşti eu face fără fi fie fiecare fii fim fiţi iar ieri îi îl îmi
împotriva în înainte înaintea încât încît încotro între întrucât
întrucît îţi la lângă le li lîngă lor lui mă mâine mea mei mele mereu
meu mi mine mult multă mulţi ne nicăieri nici nimeni nimic nişte noastră
noastre noi noştri nostru nu ori oricând oricare oricât orice oricînd
oricine oricît oricum oriunde până pe pentru peste pînă poate pot prea
prima primul prin printr sa să săi sale sau său se şi sînt sîntem
sînteţi spre sub sunt suntem sunteţi te ţi ţie tine toată toate tot
toţi totuşi tu un una unde undeva unei unele uneori unor vă vi voastră
voastre voi voştri vostru vouă vreo vreun și în să și ție
""")

# Hungarian (Snowball hungarian/stop.txt coverage)
FULL_STOPWORDS["hu"] = _w("""
a ahogy ahol aki akik akkor alatt által általában amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
abban ahhoz annak arra arról az azok azon azt azzal azért aztán azután
azonban bár be belül benne cikk cikkek cikkeket csak de e eddig egész
egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen elő először
előtt első én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen
ezzel ezért és fel felé hanem hiszen hogy hogyan igen így illetve ill
ilyen ilyenkor ison ismét itt jó jól jobban kell kellett keresztül
keressünk ki kívül között közül legalább lehet lehetett legyen lenne
lenni lesz lett maga magát majd már más másik meg még mellett mert
mely melyek mi mit míg miért milyen mikor minden mindent mindenki
mindig mint mintha mivel most nagy nagyobb nagyon ne néha nekem neki
nem néhány nélkül nincs olyan ott össze ő ők őket pedig persze rá s
saját sem semmi sok sokat sokkal számára szemben szerint szinte talán
tehát teljes tovább továbbá több úgy ugyanis új újabb újra után utána
utolsó vagy vagyis valaki valami valamint való vagyok van vannak volt
voltam voltak voltunk vissza vele viszont volna
""")

# Czech (Lucene czech stop set coverage)
FULL_STOPWORDS["cs"] = _w("""
a aby ale ani ano asi až bez bude budem budeš by byl byla byli bylo
být co což cz či článek článku články další dnes do ho i jak jako je
jeho jej její jejich jen ještě ji jiné již jsem jseš jsme jsou jste k
kam každý kde kdo když ke která které který kteří ku má mají máte mezi
mi mít mně mnou můj může my na nad nám námi naproti nás náš ne nebo
nechť nejsou není než nic nové nový o od ode on ona oni ono pak po pod
podle pokud potom pouze pozdě práve pro proč proto protože první před
přes přese při pta s se si sice strana své svůj svých svým svými ta
tak také takže tato tedy ten tento této tím tímto tipy to toho tohoto
tom tomto tomu tomuto toto tu tuto ty tyto u už v vám váš vaše ve více
však všechen vy z za zda zde ze zpět zprávy že
""")

# Polish (Lucene ships Polish via stempel; this is the common public
# polish stop set coverage)
FULL_STOPWORDS["pl"] = _w("""
a aby ach acz aczkolwiek aj albo ale ależ ani aż bardziej bardzo bo
bowiem by byli bym bynajmniej być był była było były będzie będą cali
cała cały ci cię ciebie co cokolwiek coś czasami czasem czemu czy
czyli daleko dla dlaczego dlatego do dobrze dokąd dość dużo dwa dwaj
dwie dwoje dziś dzisiaj gdy gdyby gdyż gdzie gdziekolwiek gdzieś go i
ich ile im inna inne inny innych iż ja ją jak jakaś jakby jaki jakiś
jakie jakiż jakkolwiek jako jakoś je jeden jedna jednak jednakże jedno
jego jej jemu jest jestem jeszcze jeśli jeżeli już ją każdy kiedy
kilka kimś kto ktokolwiek ktoś która które którego której który których
którym którzy ku lat lecz lub ma mają mam mi mimo między mnie mną mogą
moi moim moja moje może możliwe można mój mu musi my na nad nam nami
nas nasi nasz nasza nasze naszego naszych natomiast natychmiast nawet
nią nic nich nie niech niego niej niemu nigdy nim nimi niż no o obok
od około on ona one oni ono oraz oto owszem pan pana pani po pod
podczas pomimo ponad ponieważ powinien powinna powinni powinno poza
prawie przecież przed przede przedtem przez przy roku również sam sama
są się skąd sobie sobą sposób swoje ta tak taka taki takie także tam
te tego tej ten teraz też to tobą tobie toteż trzeba tu tutaj twoi
twoim twoja twoje twym twój ty tych tylko tym u w wam wami was wasz
wasza wasze we według wiele wielu więc więcej wszyscy wszystkich
wszystkie wszystkim wszystko wtedy wy właśnie z za zapewne zawsze ze
znowu znów został żaden żadna żadne żadnych że żeby
""")

# Turkish (Lucene turkish stop set coverage)
FULL_STOPWORDS["tr"] = _w("""
acaba altmış altı ama ancak arada aslında ayrıca bana bazı belki ben
benden beni benim beri beş bile bin bir birçok biri birkaç birkez
birşey birşeyi biz bize bizden bizi bizim böyle böylece bu buna bunda
bundan bunlar bunları bunların bunu bunun burada çok çünkü da daha
dahi de defa değil diğer diye doksan dokuz dolayı dolayısıyla dört
edecek eden ederek edilecek ediliyor edilmesi ediyor eğer elli en
etmesi etti ettiği ettiğini gibi göre halen hangi hatta hem henüz hep
hepsi her herhangi herkesin hiç hiçbir için iki ile ilgili ise işte
itibaren itibariyle kadar karşın katrilyon kendi kendilerine kendini
kendisi kendisine kendisini kez ki kim kimden kime kimi kimse kırk
milyar milyon mu mü mı mı nasıl ne neden nedenle nerde nerede nereye
niye niçin o olan olarak oldu olduğu olduğunu olduklarını olmadı
olmadığı olmak olması olmayan olmaz olsa olsun olup olur olursa oluyor
on ona ondan onlar onlardan onları onların onu onun otuz oysa öyle pek
rağmen sadece sanki sekiz seksen sen senden seni senin siz sizden sizi
sizin şey şeyden şeyi şeyler şöyle şu şuna şunda şundan şunları şunu
tarafından trilyon tüm üç üzere var vardı ve veya ya yani yapacak
yapılan yapılması yapıyor yapmak yaptı yaptığı yaptığını yaptıkları
yedi yerine yetmiş yine yirmi yoksa yüz zaten
""")

# Greek (Lucene greek stop set coverage; natural final-sigma forms)
FULL_STOPWORDS["el"] = _w("""
ο η το οι τα του της των τον την και κι κ ειμαι εισαι ειναι ειμαστε
ειστε στο στον στη στην μα αλλα απο για προς με σε ως παρα αντι κατα
μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πως ποιος ποια ποιο
ποιοι ποιες ποια ποιων ποιους αυτος αυτη αυτο αυτοι αυτων αυτους αυτες
αυτα εκεινος εκεινη εκεινο εκεινοι εκεινες εκεινα εκεινων εκεινους
οπως ομως ισως οσο οτι
""")

# Bulgarian (Lucene bulgarian stop set coverage)
FULL_STOPWORDS["bg"] = _w("""
а автентичен аз ако ала бе без беше би бил била били било благодаря
близо бъдат бъде бяха в вас ваш ваша вероятно вече взема ви вие винаги
внимава време все всеки всички всичко всяка въпреки върху г ги главен
главна главно глас го година години годишен д да дали два двама
двамата две двете ден днес дни до добра добре добро добър докато
докога дори досега доста друг друга други е евтин едва един една
еднаква еднакви еднакъв едно екип ето живот за забавям зад заедно
заради засега заспал затова защо защото и из или им има имат иска й
каза как каква какво както какъв като кога когато което които кой
който колко която къде където към лесен лесно ли лош м май малко ме
между мек мен месец ми много мнозина мога могат може мокър моля
момента му н на над назад най направи напред например нас не него
нещо нея ни ние никой нито нищо но нов нова нови новина някои някой
няколко няма обаче около освен особено от отгоре отново още пак по
повече повечето под поне поради после почти прави пред преди през при
пък първата първи първо пъти равен равна с са сам само се сега си син
скоро след следващ сме смях според сред срещу сте съм със също т тази
така такива такъв там твой те тези ти то това тогава този той толкова
точно три трябва тук тъй тя тях у утре харесва хиляди ч часа че често
чрез ще щом юмрук я як
""")

# Arabic (Lucene arabic stop set coverage)
FULL_STOPWORDS["ar"] = _w("""
من في على و فى يا ما لا اذا هذا هذه ذلك تلك هناك هنالك التي الذي
الذين اللذين اللتان اللتين هو هي هم هن انت انتم انتن انا نحن كان كانت
يكون تكون اي أي كل بعض غير بين وبين حتى إذا إلى الى إلي عن مع عند عندما
قد لقد لم لن لو ليس ثم أو او أن ان إن انه أنه كما لكن بها به فيه فيها
منه منها عليه عليها اليه اليها إليه إليها له لها لهم الا إلا اما أما
بل بك لك اذ إذ كيف أين اين متى لماذا لدى لدي ضمن حيث جدا ايضا أيضا
حول دون بعد قبل خلال منذ عبر ضد نحو هكذا فقط ربما معه معها
""")

# Indonesian (Lucene indonesian stop set coverage)
FULL_STOPWORDS["id"] = _w("""
ada adanya adalah adapun agak agaknya agar akan akankah akhirnya aku
akulah amat amatlah anda andalah antar antara antaranya apa apaan
apabila apakah apalagi apatah atau ataukah ataupun bagai bagaikan
bagaimana bagaimanakah bagaimanapun bagi bahkan bahwa bahwasanya baik
bakal bakalan banyak beberapa begini beginian beginikah beginilah
begitu begitukah begitulah begitupun belum belumlah berapa berapakah
berapalah berapapun bermacam bersama betulkah biasa biasanya bila
bilakah bisa bisakah boleh bolehkah bolehlah buat bukan bukankah
bukanlah bukannya cuma percuma dahulu dalam dan dapat dari daripada
dekat demi demikian demikianlah dengan depan di dia dialah dini
diantara diantaranya disini disinilah dong dulu enggak enggaknya
entah entahlah hal hampir hanya hanyalah harus haruslah harusnya
hendak hendaklah hendaknya hingga ia ialah ibarat ingin inginkah
inginkan ini inikah inilah itu itukah itulah jangan jangankan janganlah
jika jikalau juga justru kala kalau kalaulah kalaupun kalian kami
kamilah kamu kamulah kan kapan kapankah kapanpun karena karenanya ke
kecil kemudian kenapa kepada kepadanya ketika khususnya kini kinilah
kiranya kita kitalah kok lagi lagian lah lain lainnya lalu lama lamanya
lebih maka makanya makin malah malahan mampu mampukah mana manakala
manalagi masih masihkah masing mau maupun melainkan melalui memang
mengapa mereka merekalah meski meskipun mungkin mungkinkah nah namun
nanti nantinya nyaris oleh olehnya pada padahal padanya paling pantas
para pasti pastilah per pernah pula pun rasa rasanya rupanya saat
saatnya saja sajalah saling sama sambil sampai sana sangat sangatlah
saya sayalah se sebab sebabnya sebagai sebagaimana sebagainya sebaliknya
sebanyak sebegini sebegitu sebelum sebelumnya sebenarnya seberapa
sebetulnya sebisanya sebuah sedang sedangkan sedikit sedikitnya segala
segalanya segera seharusnya sehingga sejak sejenak sekali sekalian
sekalipun sekaligus sekarang sekitar sekitarnya sela selagi selain
selaku selalu selama selamanya seluruh seluruhnya semacam semakin
semampu semasih semata semaunya sementara sempat semua semuanya semula
sendiri sendirinya seolah seorang sepanjang sepantasnya seperti
sepertinya sering seringnya serta serupa sesaat sesama sesegera
sesekali seseorang sesuatu sesuatunya sesudah sesudahnya setelah
setempat setengah seterusnya setiap setiba setibanya setidaknya siap
siapa siapakah siapapun sini sinilah suatu sudah sudahkah sudahlah
supaya tadi tadinya tak tanpa tapi telah tentang tentu tentulah
tentunya terdiri terhadap terhadapnya tetapi tiap tiba tidak tidakkah
tidaklah toh untuk usah usai waduh wah wahai walau walaupun wong yaitu
yakni yang
""")

# Persian (Lucene persian stop set coverage)
FULL_STOPWORDS["fa"] = _w("""
و در به از که این را با های برای می آن یک شود شده خود ها کرد شد ای تا
کند بر بود گفت نیز وی هم کنند دارد ما کرده یا اما باید دو اند هر خواهد
او مورد آنها باشد دیگر مردم نمی بین پیش پس اگر همه صورت یکی هستند بی
من دهد هزار نیست استفاده داد داشته راه داشت چه همچنین کردند داده بوده
دارند همین میلیون سوی شوند بیشتر بسیار روی گرفته هایی تواند اول نام
هیچ چند جدید بیش شدن کردن کنیم نشان حتی اینکه ولی توسط چنین برخی نه
دیگری درباره بعد مختلف گیرد شما گفته آنان بار طور گرفت دهند گذاری
بسیاری طی بودند میان تنها جای چگونه دیگران همان خواهند قابل آمده کردم
کنید نزدیک دیده بخش توانند کسی چرا چون بدون مگر ضمن هنگام آیا
""")

# Lithuanian (Lucene lithuanian stop set coverage)
FULL_STOPWORDS["lt"] = _w("""
ant apie ar arba aš be bei bet bus buvo dar dabar dėl gal gali galima
ir iš ją jai jam jame jas jei jie jiems jis jo jos ju jus jūs jūsų ka
kad kai kaip kas kiek kol kur kurie kuris labai man mane manęs mano
mes metu mums mus ne nei nes net nors nuo o pagal pat per po prie
prieš sau savo su tačiau tada tai taip tarp tas tau tave tavęs tavo
tą tik tiek to todėl tos tu turi už visi visų ją jį jų yra
""")

# Latvian (Lucene latvian stop set coverage)
FULL_STOPWORDS["lv"] = _w("""
aiz ap ar apakš ārpus augšpus bez caur dēļ gar iekš iz kopš labad lejpus
līdz no otrpus pa par pār pēc pie pirms pret priekš starp šaipus uz
viņpus virs virspus zem apakšpus un bet jo ja ka lai tomēr tikko turpretī
arī kaut gan tādēļ tā ne tikvien vien kā ir te vai kamēr ar diezin droši
diemžēl nebūt ik it taču nu pat tiklab iekšpus nedz tik nevis turpretim
jeb iekam iekām iekāms kolīdz līdzko tiklīdz jebšu tālab tāpēc nekā
itin jā jau jel nē nezin tad tikai vis tak iekams esmu esi esam esat
būšu būsi būs būsim būsiet biju biji bija bijām bijāt būt man mani
manis tev tevi tevis viņš viņa viņu viņam viņai mēs mūs mums jūs
""")

# Basque (Lucene basque stop set coverage)
FULL_STOPWORDS["eu"] = _w("""
al anitz arabera asko baina bat batean batek bati batzuei batzuek
batzuetan batzuk bera beraiek berau berauek bere berori beroriek beste
bezala da dago dira ditu du dute edo egin ere eta eurak ez gainera gu
gutxi guzti haiei haiek haietan hainbeste hala han handik hango hara
hari hark hartan hau hauei hauek hauetan hemen hemendik hemengo hi
hona honek honela honetan honi hor hori horiei horiek horietan horko
horra horrek horrela horretan horri hortik hura izan ni noiz nola nor
nora ze zein zen zenbait zenbat zer zergatik ziren zituen zu zuek zuen
zuten
""")

# Irish (Lucene irish stop set coverage)
FULL_STOPWORDS["ga"] = _w("""
a ach ag agus an aon ar arna as b ba beirt bhúr caoga ceathair ceathrar
chomh chtó chun cois céad cúig cúigear d daichead dar de deich deichniúr
den dhá do don dtí dá dár dó faoi faoin faoina faoinár fara fiche
gach gan go gur haon hocht i iad idir in ina ins inár is le leis lena
lenár m mar mo mé na nach naoi naonúr ná ní níor nó nócha ocht ochtar
os roimh sa seacht seachtar seachtó seasca seisear siad sibh sinn sna
sé sí tar thar thú triúr trí trína trínár tríocha tú um ár é éis í ó
ón óna ónár
""")

# Galician (Lucene galician stop set coverage)
FULL_STOPWORDS["gl"] = _w("""
a aínda alí aquel aquela aquelas aqueles aquilo aquí ao aos as así á
ben cando che co coa comigo con connosco contigo convosco coas cos
cun cuns cunha cunhas da dalgunha dalgunhas dalgún dalgúns das de
del dela delas deles desde deste do dos dun duns dunha dunhas e el
ela elas eles en era eran esa esas ese eses esta estaba estar este
estes estiven estou eu é facer foi foron fun había hai iso isto la
las lle lles lo los mais me meu meus min miña miñas moi na nas neste
nin no non nos nosa nosas noso nosos nós nun nunha nuns nunhas o os
ou ó ós para pero pode pois pola polas polo polos por que se senón
ser seu seus sexa sido sobre súa súas tamén tan te ten teñen teño
ter teu teus ti tido tiña tiven túa túas un unha unhas uns vos vosa
vosas voso vosos vós
""")

# Armenian (Lucene armenian stop set — the published set is ~45 words)
FULL_STOPWORDS["hy"] = _w("""
այդ այլ այն այս դու դուք եմ են ենք ես եք է էի էին էինք էիր էիք էր ըստ
թ ի ին իսկ իր կամ համար հետ հետո մենք մեջ մի ն նա նաև նրա նրանք որ որը
որոնք որպես ու ում պիտի վրա և
""")

# Estonian (function-word coverage at the Lucene-adjacent scale)
FULL_STOPWORDS["et"] = _w("""
aga ei et ja jah kas kui kõik ma me mida midagi mind minu minagi mis
mu mul mulle nad nagu need neid nende nii ning nüüd oled olen oli olid
olla olnud on oma ometi pole sa seda see selle sellega selleks sellel
sellele sellest sest siin siis sina sinna sinu ta tal talle tema
temaga tule vaid veel või üle üks kes kelle keda kus kust kuhu
""")

# Catalan (Lucene catalan stop set coverage)
FULL_STOPWORDS["ca"] = _w("""
a abans ací ah així això al als altre altra altres amb ambdues ambdós
anar ans apa aquell aquella aquelles aquells aquest aquesta aquestes
aquests aquí baix cada cadascuna cadascunes cadascuns cadascú com
contra d dalt de del dels des després dins dintre donat doncs durant e
eh el elles ells els em en encara ens entre era erem eren eres es esta
estan estat estava estaven estem esteu estic està estàvem estàveu et
etc ets fins fora gairebé ha han has haver havia he hem heu hi ho i ja
jo l la les li li'n llarg llavors m ma mal malgrat mateix mateixa
mateixes mateixos me mentre meu meus meva meves molt molta moltes
molts mon mons més n ne ni no nogensmenys només nosaltres nostra
nostre nostres o oh oi on pas pel pels per perquè però poc poca pocs
poques potser propi qual quals quan quant que quelcom qui quin quina
quines quins s sa semblant semblants ses seu seus seva seves si sobre
sobretot solament sols son sons sota sou t ta tal també tampoc tan
tant tanta tantes te teu teus teva teves ton tons tot tota totes tots
un una unes uns us va vaig vam van vas veu vosaltres vostra vostre
vostres érem éreu és
""")
