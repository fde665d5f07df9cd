"""Typed SSL/SASL option mapping (parity with the reference's flat
security kwargs, kaflow/applications.py:91-186, compiled to Kafka
Java-client options instead of an aiokafka SSLContext)."""

import pytest

from kaflow_spark.app import App
from kaflow_spark.security import KafkaSecurity


def test_sasl_ssl_scram_full_map():
    sec = KafkaSecurity(
        security_protocol="SASL_SSL",
        cafile="/etc/pki/ca-bundle.pem",
        sasl_mechanism="SCRAM-SHA-512",
        sasl_plain_username="svc-etl",
        sasl_plain_password="s3cr3t",
    )
    assert sec.options() == {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.ssl.truststore.type": "PEM",
        "kafka.ssl.truststore.location": "/etc/pki/ca-bundle.pem",
        "kafka.sasl.mechanism": "SCRAM-SHA-512",
        "kafka.sasl.jaas.config": (
            "org.apache.kafka.common.security.scram.ScramLoginModule "
            'required username="svc-etl" password="s3cr3t";'
        ),
    }


def test_sasl_plain_jaas_escaping():
    sec = KafkaSecurity(
        security_protocol="SASL_PLAINTEXT",
        sasl_mechanism="PLAIN",
        sasl_plain_username="u",
        sasl_plain_password='p"w\\x',
    )
    jaas = sec.options()["kafka.sasl.jaas.config"]
    assert jaas == (
        "org.apache.kafka.common.security.plain.PlainLoginModule "
        'required username="u" password="p\\"w\\\\x";'
    )


def test_mutual_tls_inline_ca_and_key_password():
    sec = KafkaSecurity(
        security_protocol="SSL",
        cadata="-----BEGIN CERTIFICATE-----\nabc\n-----END CERTIFICATE-----",
        certfile="/etc/pki/client-combined.pem",
        cert_password="kp",
    )
    opts = sec.options()
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert "kafka.ssl.truststore.location" not in opts
    assert opts["kafka.ssl.truststore.certificates"].startswith("-----BEGIN")
    assert opts["kafka.ssl.keystore.type"] == "PEM"
    assert opts["kafka.ssl.keystore.location"] == "/etc/pki/client-combined.pem"
    assert opts["kafka.ssl.key.password"] == "kp"


def test_gssapi_service_name():
    sec = KafkaSecurity(
        security_protocol="SASL_PLAINTEXT",
        sasl_mechanism="GSSAPI",
        sasl_kerberos_service_name="broker",
    )
    opts = sec.options()
    assert opts["kafka.sasl.kerberos.service.name"] == "broker"
    assert "kafka.sasl.jaas.config" not in opts


def test_ssl_material_ignored_without_ssl_protocol():
    # SASL_PLAINTEXT carries no TLS; trust material must not leak in.
    sec = KafkaSecurity(
        security_protocol="SASL_PLAINTEXT",
        cafile="/ca.pem",
        sasl_mechanism="PLAIN",
        sasl_plain_username="u",
        sasl_plain_password="p",
    )
    assert "kafka.ssl.truststore.location" not in sec.options()


@pytest.mark.parametrize(
    "kwargs,msg",
    [
        (dict(security_protocol="TLS"), "security_protocol"),
        (dict(security_protocol="SASL_SSL"), "requires sasl_mechanism"),
        (
            dict(security_protocol="SASL_SSL", sasl_mechanism="NTLM"),
            "sasl_mechanism",
        ),
        (
            dict(security_protocol="PLAINTEXT", sasl_mechanism="PLAIN"),
            "use SASL_PLAINTEXT or SASL_SSL",
        ),
        (
            dict(
                security_protocol="SASL_SSL",
                sasl_mechanism="SCRAM-SHA-256",
                sasl_plain_username="u",
            ),
            "sasl_plain_password",
        ),
        (dict(security_protocol="SSL", capath="/etc/ssl/certs"), "capath"),
        (
            dict(security_protocol="SSL", cafile="/a.pem", cadata="x"),
            "not both",
        ),
        (
            dict(security_protocol="SSL", certfile="/c.pem", keyfile="/k.pem"),
            "single file",
        ),
        (dict(security_protocol="SSL", keyfile="/k.pem"), "keyfile without"),
    ],
)
def test_invalid_configs_raise(kwargs, msg):
    with pytest.raises(ValueError, match=msg):
        KafkaSecurity(**kwargs)


def test_split_keypair_ok_when_same_file():
    sec = KafkaSecurity(
        security_protocol="SSL", certfile="/c.pem", keyfile="/c.pem"
    )
    assert sec.options()["kafka.ssl.keystore.location"] == "/c.pem"


def test_app_flat_kwargs_reach_client_options():
    """The App constructor takes the same flat kwargs as the reference
    and folds them into every source/sink option map."""
    app = App(
        brokers="b:9093",
        security_protocol="SASL_SSL",
        cafile="/ca.pem",
        sasl_mechanism="PLAIN",
        sasl_plain_username="u",
        sasl_plain_password="p",
        acks="all",
    )
    opts = app._client_options()
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.ssl.truststore.location"] == "/ca.pem"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert opts["kafka.acks"] == "all"


def test_app_plaintext_default_emits_no_security_options():
    opts = App(brokers="b:9092")._client_options()
    assert not any(k.startswith("kafka.s") for k in opts)


def test_app_kafka_options_override_typed_surface():
    """Explicit kafka_options passthrough wins over the typed kwargs
    (an escape hatch for e.g. OAUTHBEARER callback classes)."""
    app = App(
        brokers="b:9093",
        security_protocol="SASL_SSL",
        sasl_mechanism="OAUTHBEARER",
        kafka_options={
            "kafka.sasl.login.callback.handler.class": "com.example.OAuth",
            "kafka.security.protocol": "SASL_SSL",
        },
    )
    opts = app._client_options()
    assert opts["kafka.sasl.login.callback.handler.class"] == "com.example.OAuth"
    assert opts["kafka.sasl.mechanism"] == "OAUTHBEARER"
