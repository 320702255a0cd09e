"""Golden HTML fixtures — ported from the reference's unit tests
(/root/reference/firmware/tests/test_avm.py:6-72 and
test_linksys.py:6-91). These pin extraction semantics; the synthetic
corpus generator (sources/generate.py) stamps scaled variants of the
same templates.
"""

AVM_PRODUCT_PAGE = """<html lang="en">
    <head><meta charset="UTF-8"><title>Index of /fritzbox/</title></head>
    <body>
        <pre>
            <a href="../">../</a>
            <a href="beta/">beta/</a>
            01-Jan-2019 02:45 -
            <a href="fritzbox-1234/">fritzbox-1234/</a>
            12-Aug-2019 12:13 -
            <a href="tools/">tools/</a>
            13-Sep-2017 21:18 -
            <a href="license.txt">license.txt</a>
            21-Jun-2018 01:10 28193
        </pre>
    </body>
</html>"""

AVM_LOCATION_PAGE = """<html lang="en">
    <head><meta charset="UTF-8"><title>Index of /fritzbox/fritzbox-1234/</title></head>
    <body>
        <pre>
            <a href="../">../</a>
            <a href="deutschland/">deutschland/</a>
            12-Aug-2019 12:13 -
            <a href="other/">other/</a>
            13-Sep-2017 21:18 -
        </pre>
    </body>
</html>"""

AVM_OS_PAGE = """<html lang="en">
    <head><meta charset="UTF-8"><title>Index of /fritzbox/fritzbox-1234/deutschland/</title></head>
    <body>
        <pre>
            <a href="../">../</a>
            <a href="fritz.os/">fritz.os/</a>
            12-Aug-2019 12:13 -
            <a href="recover/">recover/</a>
            13-Sep-2017 21:18 -
        </pre>
    </body>
</html>"""

AVM_FIRMWARE_PAGE = """<html lang="en">
    <head><meta charset="UTF-8"><title>Index of /fritzbox/fritzbox-1234/deutschland/fritz.os/</title></head>
    <body>
        <pre>
            <a href="../">../</a>
            <a href="FRITZ.Box_1234-07.12.image">FRITZ.Box_1234-07.12.image</a>
            12-Aug-2019 12:13 22241280
            <a href="info_de.txt">info_de.txt</a>
            13-Sep-2017 21:18 47418
        </pre>
    </body>
</html>"""

LINKSYS_PRODUCT_LIST_PAGE = """<!DOCTYPE html>
<html><head></head><body><main><div>
    <div class="item"><ul><li>
        <a href="/de/support-product?pid=1234">Broadband Router</a>
        <a href="/de/support-product?pid=5678">Modem Router</a>
    </li></ul></div>
</div></main></body></html>"""

LINKSYS_PRODUCT_PAGE = """<!DOCTYPE html>
<html><head></head><body><main><div>
    <div class="support-downloads col-sm-6"><div><p>
        <a href="/de/support-article?articleNum=1234" title="Download Software">Download Software</a>
        <a href="/de/support-article?articleNum=4321" title="Lizensvereinbarung">Lizensvereinbarung</a>
    </p></div></div>
</div></main></body></html>"""

# Accordion content in the inline (single-line) style of the reference's
# SEARCH_TEXT golden vector (test_linksys.py:89-91) so the Ver/href regex
# semantics (linksys.py:86) apply as in the golden meta-data test.
LINKSYS_FIRMWARE_PAGE = (
    '<!DOCTYPE html><html><head></head><body><div>'
    '<div id="support-article-downloads">'
    '<div class="article-accordian-content collapse-me">'
    '<h3>Firmware (für USA)</h3>Ver.1.203.23 (build 20394)<br>'
    'Datum der letzten Version: 08/23/2019<br>'
    '<a href="http://downloads.linksys.com/downloads/firmware/FW_EA6300_1.203.23.20394_prod.gpg.img">Herunterladen</a>'
    '<h3>Firmware</h3>Ver.2.03.21<br>Datum der letzten Version: 02/05/2018<br>'
    '<a href="http://downloads.linksys.com/downloads/firmware/FW_EA6300_2.03.21_prod.img">Herunterladen</a>'
    '<h3>Firmware</h3>Ver.2.03.21<br>Datum der letzten Version: 02/05/2018<br>'
    '<a href="http://downloads.linksys.com/downloads/firmware/FW_EA6300_2.03.21_prod.img">Herunterladen</a>'
    '<h3>Installation Tool</h3>Ver.1.1.0<br>Datum der letzten Version: 02/01/2018<br>'
    '<a href="http://downloads.linksys.com/downloads/firmware/FW_EA6300_2.03.21.exe">Herunterladen</a>'
    '</div></div></div></body></html>'
)

LINKSYS_SEARCH_TEXT = (
    '<h3>Firmware (für USA)</h3>Ver.1.203.23 (build 20394)<br>'
    'Datum der letzten Version: 08/23/2019<br>'
    '<a href="http://downloads.linksys.com/downloads/firmware/FW_EA6300_1.203.23.20394_prod.gpg.img">'
    'Herunterladen</a>'
)
